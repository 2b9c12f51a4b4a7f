_base_ = ["../_base_/default_runtime.py"]
# PPT language-guided joint training over SemanticKITTI + nuScenes + Waymo
# (reference configs/semantic_kitti/semseg-ppt-v1m1-0-sk-nu-wa-spunet.py)

batch_size = 12
slot_size = 131072
eval_epoch = 50

train = dict(type="MultiDatasetTrainer")

model = dict(
    type="PPT-v1m1",
    conditions=("SemanticKITTI", "NuScenes", "Waymo"),
    num_classes=(19, 16, 22),
    context_channels=256,
    backbone_out_channels=96,
    embed_dim=512,
    backbone=dict(
        type="SpUNet-v1m3",
        in_channels=4,
        num_classes=0,
        base_channels=32,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        pdnorm_conditions=3,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

optimizer = dict(type="SGD", lr=0.05, momentum=0.9, weight_decay=1e-4, nesterov=True)
scheduler = dict(type="OneCycleLR", pct_start=0.05, div_factor=10.0, final_div_factor=10000.0)

_outdoor_transform = [
    dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.005, clip=0.02),
    dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
         return_grid_coord=True),
    dict(type="Collect", keys=("coord", "grid_coord", "segment"),
         feat_keys=("coord", "strength")),
]

data = dict(
    num_classes=19,
    ignore_index=-1,
    train=dict(
        datasets=[
            dict(type="SemanticKITTIDataset", split="train", data_root="data/semantic_kitti",
                 condition=0, loop=1, transform=_outdoor_transform),
            dict(type="NuScenesDataset", split="train", data_root="data/nuscenes",
                 condition=1, loop=1, transform=_outdoor_transform),
            dict(type="WaymoDataset", split="training", data_root="data/waymo",
                 condition=2, loop=1, transform=_outdoor_transform),
        ],
    ),
    val=dict(
        type="SemanticKITTIDataset",
        split="val",
        data_root="data/semantic_kitti",
        transform=[
            dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
                 return_grid_coord=True),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"),
                 feat_keys=("coord", "strength")),
        ],
    ),
)
