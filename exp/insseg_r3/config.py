seed = 7
save_path = 'exp/insseg_r3'
weight = 'exp/insseg_r3/model_params.ckpt'
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
eval_epoch = 48
train = {'type': 'DefaultTrainer'}
hooks = [{'type': 'CheckpointLoader'},
 {'type': 'IterationTimer', 'warmup_iter': 2},
 {'type': 'InformationWriter'},
 {'type': 'InsSegEvaluator',
  'segment_ignore_index': (-1, 0, 1),
  'cluster_thresh': 0.08,
  'min_points': 50},
 {'type': 'CheckpointSaver'}]
enable_tensorboard = False
num_classes = 6
segment_ignore_index = (-1, 0, 1)
num_worker = 2
model = {'type': 'PG-v1m1',
 'backbone': {'type': 'SpUNet-v1m1',
              'in_channels': 6,
              'num_classes': 0,
              'base_channels': 16,
              'channels': (16, 32, 48, 64, 64, 48, 32, 32),
              'layers': (1, 1, 1, 1, 1, 1, 1, 1),
              'stem_kernel': 3,
              'bn_momentum': 0.1},
 'backbone_out_channels': 32,
 'semantic_num_classes': 6,
 'segment_ignore_index': (-1, 0, 1),
 'cluster_thresh': 0.08}
optimizer = {'type': 'AdamW', 'lr': 0.003, 'weight_decay': 0.0001}
scheduler = {'type': 'PolyLR', 'power': 0.9}
_pipeline = [{'type': 'CenterShift', 'apply_z': True},
 {'type': 'GridSample', 'grid_size': 0.05, 'mode': 'train', 'return_grid_coord': True},
 {'type': 'NormalizeColor'},
 {'type': 'InstanceParser', 'segment_ignore_index': (-1, 0, 1)},
 {'type': 'Collect',
  'keys': ('coord', 'grid_coord', 'segment', 'instance', 'instance_centroid'),
  'feat_keys': ('coord', 'color')}]
data = {'num_classes': 6,
 'ignore_index': -1,
 'train': {'type': 'SyntheticSemSegDataset',
           'split': 'train',
           'num_scenes': 48,
           'num_points': 8000,
           'num_classes': 6,
           'loop': 1,
           'transform': [{'type': 'CenterShift', 'apply_z': True},
                         {'type': 'RandomRotate', 'angle': [-1, 1], 'axis': 'z', 'p': 0.5},
                         {'type': 'RandomFlip', 'p': 0.5},
                         {'type': 'GridSample',
                          'grid_size': 0.05,
                          'mode': 'train',
                          'return_grid_coord': True},
                         {'type': 'NormalizeColor'},
                         {'type': 'InstanceParser', 'segment_ignore_index': (-1, 0, 1)},
                         {'type': 'Collect',
                          'keys': ('coord',
                                   'grid_coord',
                                   'segment',
                                   'instance',
                                   'instance_centroid'),
                          'feat_keys': ('coord', 'color')}]},
 'val': {'type': 'SyntheticSemSegDataset',
         'split': 'val',
         'num_scenes': 6,
         'num_points': 8000,
         'num_classes': 6,
         'transform': [{'type': 'CenterShift', 'apply_z': True},
                       {'type': 'GridSample',
                        'grid_size': 0.05,
                        'mode': 'train',
                        'return_grid_coord': True},
                       {'type': 'NormalizeColor'},
                       {'type': 'InstanceParser', 'segment_ignore_index': (-1, 0, 1)},
                       {'type': 'Collect',
                        'keys': ('coord', 'grid_coord', 'segment', 'instance', 'instance_centroid'),
                        'feat_keys': ('coord', 'color')}]},
 'test': {'type': 'SyntheticSemSegDataset',
          'split': 'val',
          'num_scenes': 6,
          'num_points': 8000,
          'num_classes': 6,
          'transform': [{'type': 'CenterShift', 'apply_z': True},
                        {'type': 'GridSample',
                         'grid_size': 0.05,
                         'mode': 'train',
                         'return_grid_coord': True},
                        {'type': 'NormalizeColor'},
                        {'type': 'InstanceParser', 'segment_ignore_index': (-1, 0, 1)},
                        {'type': 'Collect',
                         'keys': ('coord',
                                  'grid_coord',
                                  'segment',
                                  'instance',
                                  'instance_centroid'),
                         'feat_keys': ('coord', 'color')}]}}
test = {'type': 'InsSegTester',
 'segment_ignore_index': (-1, 0, 1),
 'cluster_thresh': 0.08,
 'cluster_min_points': 50,
 'capacity': 4096}
