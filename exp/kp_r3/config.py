seed = 42
save_path = 'exp/kp_r3'
weight = None
resume = False
evaluate = True
amp = None
clip_grad = None
gradient_accumulation_steps = 1
remat = False
batch_size = 4
batch_size_val = None
slot_size = 4096
mix_prob = 0.0
eval_epoch = 64
train = {'type': 'DefaultTrainer'}
hooks = [{'type': 'CheckpointLoader'},
 {'type': 'IterationTimer', 'warmup_iter': 2},
 {'type': 'InformationWriter'},
 {'type': 'OffsetKeypointEvaluator', 'aggregate': 'weighted'},
 {'type': 'CheckpointSaver'}]
enable_tensorboard = False
num_keypoints = 6
model = {'type': 'OffsetKeypointPTv3',
 'num_keypoints': 6,
 'hidden_dim': 128,
 'backbone_conf': {'type': 'PT-v3m1',
                   'in_channels': 7,
                   'stride': (2, 2),
                   'enc_depths': (1, 1, 1),
                   'enc_channels': (32, 64, 128),
                   'enc_num_head': (2, 4, 8),
                   'enc_patch_size': (32, 32, 32),
                   'dec_depths': (1, 1),
                   'dec_channels': (32, 64),
                   'dec_num_head': (2, 4),
                   'dec_patch_size': (32, 32),
                   'mlp_ratio': 2,
                   'drop_path': 0.1,
                   'slot_divisors': (1, 2, 4),
                   'stem_kernel': 3}}
optimizer = {'type': 'AdamW', 'lr': 0.0015, 'weight_decay': 0.01}
scheduler = {'type': 'CosineAnnealingLR', 'eta_min': 1e-05}
data = {'num_classes': 6,
 'train': {'type': 'SyntheticKeypointDataset',
           'split': 'train',
           'num_scenes': 128,
           'num_points': 6000,
           'num_keypoints': 6,
           'offset_radius': 120.0,
           'loop': 1,
           'transform': [{'type': 'GridSample',
                          'grid_size': 0.02,
                          'mode': 'train',
                          'return_grid_coord': True},
                         {'type': 'ShufflePoint'},
                         {'type': 'Collect',
                          'keys': ('coord',
                                   'grid_coord',
                                   'keypoint_offset',
                                   'keypoint_mask',
                                   'scale',
                                   'centroid'),
                          'feat_keys': ('coord', 'feat')}]},
 'val': {'type': 'SyntheticKeypointDataset',
         'split': 'val',
         'num_scenes': 8,
         'num_points': 6000,
         'num_keypoints': 6,
         'offset_radius': 120.0,
         'transform': [{'type': 'GridSample',
                        'grid_size': 0.02,
                        'mode': 'train',
                        'return_grid_coord': True},
                       {'type': 'Collect',
                        'keys': ('coord',
                                 'grid_coord',
                                 'keypoint_offset',
                                 'keypoint_mask',
                                 'scale',
                                 'centroid'),
                        'feat_keys': ('coord', 'feat')}]}}
num_worker = 2
data_train_transform = [{'type': 'GridSample', 'grid_size': 0.02, 'mode': 'train', 'return_grid_coord': True},
 {'type': 'ShufflePoint'},
 {'type': 'Collect',
  'keys': ('coord', 'grid_coord', 'keypoint_offset', 'keypoint_mask', 'scale', 'centroid'),
  'feat_keys': ('coord', 'feat')}]
