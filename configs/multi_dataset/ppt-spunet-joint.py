_base_ = ["../_base_/default_runtime.py"]
# BASELINE config #5 (training half): PPT multi-dataset joint training over
# ScanNet + S3DIS (+ SemanticKITTI), decoupled heads + condition prompting.

batch_size = 8
slot_size = 131072
eval_epoch = 100

train = dict(type="MultiDatasetTrainer")

model = dict(
    type="PPT-v1m2",
    conditions=("ScanNet", "S3DIS"),
    num_classes=(20, 13),
    context_channels=32,
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6 + 32,  # features + condition context
        num_classes=0,  # feature mode
        base_channels=32,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
    backbone_out_channels=96,
)

optimizer = dict(type="SGD", lr=0.05, momentum=0.9, weight_decay=1e-4, nesterov=True)
scheduler = dict(type="OneCycleLR", pct_start=0.05, div_factor=10.0, final_div_factor=10000.0)

_common_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.005, clip=0.02),
    dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
    dict(type="ChromaticTranslation", p=0.95, ratio=0.05),
    dict(type="ChromaticJitter", p=0.95, std=0.05),
    dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train", return_grid_coord=True),
    dict(type="SphereCrop", point_max=100000, mode="random"),
    dict(type="CenterShift", apply_z=False),
    dict(type="NormalizeColor"),
    dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("color", "normal")),
]

data = dict(
    num_classes=20,
    ignore_index=-1,
    train=dict(
        datasets=[
            dict(
                type="ScanNetDataset",
                split="train",
                data_root="data/scannet",
                condition=0,
                loop=1,
                transform=_common_transform,
            ),
            dict(
                type="S3DISDataset",
                split=("Area_1", "Area_2", "Area_3", "Area_4", "Area_6"),
                data_root="data/s3dis",
                condition=1,
                loop=1,
                transform=_common_transform,
            ),
        ],
    ),
    val=dict(
        type="ScanNetDataset",
        split="val",
        data_root="data/scannet",
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train", return_grid_coord=True),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("color", "normal")),
        ],
    ),
)
