_base_ = ["../semantic_kitti/semseg-ptv3-base.py"]
# PTv3 semseg on nuScenes lidarseg (recipe parity: reference
# configs/nuscenes/semseg-pt-v3m1-0-base.py — 16 classes, 0.05 grid)

num_classes = 16

model = dict(
    backbone=dict(in_channels=4),
)

data = dict(
    num_classes=16,
    train=dict(_delete_=True,
        type="NuScenesDataset",
        split="train",
        data_root="data/nuscenes",
        sweeps=1,
        transform=[
            dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
            dict(type="RandomScale", scale=[0.9, 1.1]),
            dict(type="RandomFlip", p=0.5),
            dict(type="RandomJitter", sigma=0.005, clip=0.02),
            dict(type="PointClip", point_cloud_range=(-51.2, -51.2, -4, 51.2, 51.2, 2.4)),
            dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
                 return_grid_coord=True),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"),
                 feat_keys=("coord", "strength")),
        ],
    ),
    val=dict(_delete_=True,
        type="NuScenesDataset",
        split="val",
        data_root="data/nuscenes",
        transform=[
            dict(type="PointClip", point_cloud_range=(-51.2, -51.2, -4, 51.2, 51.2, 2.4)),
            dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
                 return_grid_coord=True),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"),
                 feat_keys=("coord", "strength")),
        ],
    ),
)
