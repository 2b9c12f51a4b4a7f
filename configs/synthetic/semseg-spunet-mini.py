_base_ = ["../_base_/default_runtime.py"]

# mini synthetic scene semseg — the smoke-test config (SURVEY.md §7.2 step 4)
num_classes = 6
batch_size = 4
batch_size_val = 4
slot_size = 4096
eval_epoch = 3

model = dict(
    type="DefaultSegmentor",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=num_classes,
        base_channels=16,
        channels=(16, 32, 48, 64, 64, 48, 32, 32),
        layers=(1, 1, 1, 1, 1, 1, 1, 1),
        stem_kernel=3,
        bn_momentum=0.1,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

optimizer = dict(type="AdamW", lr=3e-3, weight_decay=1e-4)
scheduler = dict(type="PolyLR", power=0.9)

data = dict(
    num_classes=num_classes,
    ignore_index=-1,
    train=dict(
        type="SyntheticSemSegDataset",
        split="train",
        num_scenes=8,
        num_points=6000,
        num_classes=num_classes,
        loop=4,
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="RandomRotate", angle=[-1, 1], axis="z", p=0.5),
            dict(type="RandomScale", scale=[0.9, 1.1]),
            dict(type="RandomFlip", p=0.5),
            dict(type="RandomJitter", sigma=0.005, clip=0.02),
            dict(type="GridSample", grid_size=0.05, mode="train", return_grid_coord=True),
            dict(type="NormalizeColor"),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("coord", "color")),
        ],
    ),
    val=dict(
        type="SyntheticSemSegDataset",
        split="val",
        num_scenes=4,
        num_points=6000,
        num_classes=num_classes,
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="GridSample", grid_size=0.05, mode="train", return_grid_coord=True),
            dict(type="NormalizeColor"),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("coord", "color")),
        ],
    ),
)
