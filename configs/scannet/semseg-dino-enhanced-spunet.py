_base_ = ["./semseg-spunet-v1m1-0-base.py"]
# DINO-enhanced segmentation (capability parity: `models/default.py:206-288`
# DINOEnhancedSegmentor + `engines/test.py:361-604` DINOSemSegTester): every
# point is augmented with the feature of its nearest neighbour in a side
# "DINO point cloud" lifted from posed RGB frames
# (datasets/preprocessing/dino.py writes dino_coord.npy / dino_feat.npy).
#
# The knn match runs in the UNAUGMENTED world frame: Copy(coord->origin_coord)
# BEFORE any spatial transform, and origin_coord rides through
# GridSample/crops into Collect.

model = dict(
    _delete_=True,
    type="DINOEnhancedSegmentor",
    num_classes=20,
    backbone_out_channels=96,
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=0,
        base_channels=32,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
    freeze_backbone=False,
)

test = dict(type="DINOSemSegTester", dino_capacity=65536)

data = dict(
    train=dict(
        transform=[
            dict(type="Copy", keys_dict=dict(coord="origin_coord")),
            dict(type="CenterShift", apply_z=True),
            dict(type="RandomDropout", dropout_ratio=0.2, dropout_application_ratio=0.2),
            dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
            dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="x", p=0.5),
            dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="y", p=0.5),
            dict(type="RandomScale", scale=[0.9, 1.1]),
            dict(type="RandomFlip", p=0.5),
            dict(type="RandomJitter", sigma=0.005, clip=0.02),
            dict(type="ElasticDistortion", distortion_params=[[0.2, 0.4], [0.8, 1.6]]),
            dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
            dict(type="ChromaticTranslation", p=0.95, ratio=0.05),
            dict(type="ChromaticJitter", p=0.95, std=0.05),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train", return_grid_coord=True),
            dict(type="SphereCrop", point_max=100000, mode="random"),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="ShufflePoint"),
            dict(type="Collect",
                 keys=("coord", "origin_coord", "grid_coord", "segment"),
                 feat_keys=("color", "normal")),
        ],
    ),
    val=dict(
        transform=[
            dict(type="Copy", keys_dict=dict(coord="origin_coord")),
            dict(type="CenterShift", apply_z=True),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train", return_grid_coord=True),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="Collect",
                 keys=("coord", "origin_coord", "grid_coord", "segment"),
                 feat_keys=("color", "normal")),
        ],
    ),
    test=dict(
        transform=[
            dict(type="Copy", keys_dict=dict(coord="origin_coord", segment="origin_segment")),
            dict(type="CenterShift", apply_z=True),
            dict(type="NormalizeColor"),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train",
                 return_inverse=True, return_grid_coord=True),
        ],
        test_cfg=dict(
            voxelize=dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="test",
                          return_grid_coord=True),
            crop=None,
            post_transform=[
                dict(type="CenterShift", apply_z=False),
                dict(type="Collect",
                     keys=("coord", "origin_coord", "grid_coord", "index"),
                     feat_keys=("color", "normal")),
            ],
            aug_transform=[[dict(type="RandomScale", scale=[1.0, 1.0])]],
        ),
    ),
)
