seed = 123
save_path = 'exp/semseg_r3'
weight = None
resume = False
evaluate = True
amp = None
clip_grad = None
gradient_accumulation_steps = 1
remat = False
batch_size = 4
batch_size_val = 4
slot_size = 8192
mix_prob = 0.0
eval_epoch = 60
train = {'type': 'DefaultTrainer'}
hooks = [{'type': 'CheckpointLoader'},
 {'type': 'IterationTimer', 'warmup_iter': 2},
 {'type': 'InformationWriter'},
 {'type': 'SemSegEvaluator'},
 {'type': 'CheckpointSaver'}]
enable_tensorboard = False
num_classes = 6
model = {'type': 'DefaultSegmentor',
 'backbone': {'type': 'SpUNet-v1m1',
              'in_channels': 6,
              'num_classes': 6,
              'base_channels': 24,
              'channels': (24, 48, 64, 96, 96, 64, 48, 48),
              'layers': (2, 2, 2, 2, 2, 2, 2, 2),
              'stem_kernel': 3,
              'bn_momentum': 0.1},
 'criteria': [{'type': 'CrossEntropyLoss', 'loss_weight': 1.0, 'ignore_index': -1}]}
optimizer = {'type': 'AdamW', 'lr': 0.003, 'weight_decay': 0.0001}
scheduler = {'type': 'PolyLR', 'power': 0.9}
data = {'num_classes': 6,
 'ignore_index': -1,
 'train': {'type': 'SyntheticSemSegDataset',
           'split': 'train',
           'num_scenes': 96,
           'num_points': 16000,
           'num_classes': 6,
           'loop': 1,
           'transform': [{'type': 'CenterShift', 'apply_z': True},
                         {'type': 'RandomRotate', 'angle': [-1, 1], 'axis': 'z', 'p': 0.5},
                         {'type': 'RandomScale', 'scale': [0.9, 1.1]},
                         {'type': 'RandomFlip', 'p': 0.5},
                         {'type': 'RandomJitter', 'sigma': 0.005, 'clip': 0.02},
                         {'type': 'GridSample',
                          'grid_size': 0.05,
                          'mode': 'train',
                          'return_grid_coord': True},
                         {'type': 'NormalizeColor'},
                         {'type': 'Collect',
                          'keys': ('coord', 'grid_coord', 'segment'),
                          'feat_keys': ('coord', 'color')}]},
 'val': {'type': 'SyntheticSemSegDataset',
         'split': 'val',
         'num_scenes': 8,
         'num_points': 16000,
         'num_classes': 6,
         'transform': [{'type': 'CenterShift', 'apply_z': True},
                       {'type': 'GridSample',
                        'grid_size': 0.05,
                        'mode': 'train',
                        'return_grid_coord': True},
                       {'type': 'NormalizeColor'},
                       {'type': 'Collect',
                        'keys': ('coord', 'grid_coord', 'segment'),
                        'feat_keys': ('coord', 'color')}]}}
num_worker = 2
