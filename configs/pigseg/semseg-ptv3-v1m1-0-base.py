_base_ = ["../_base_/default_runtime.py"]
# Pig semantic segmentation with PTv3 (parity: reference
# configs/pigseg/semseg-ptv3-v1m1-0-base.py; PigDataset = N x 8 npy clouds
# xyz + normal + curvature + label, mm units, median-centered)

num_classes = 2
batch_size = 8
slot_size = 32768
eval_epoch = 100

model = dict(
    type="DefaultSegmentorV2",
    num_classes=num_classes,
    backbone_out_channels=64,
    backbone=dict(
        type="PT-v3m1",
        in_channels=4,  # normal + curvature
        stride=(2, 2, 2, 2),
        enc_depths=(2, 2, 2, 6, 2),
        enc_channels=(32, 64, 128, 256, 512),
        enc_num_head=(2, 4, 8, 16, 32),
        enc_patch_size=(128, 128, 128, 128, 128),
        dec_depths=(2, 2, 2, 2),
        dec_channels=(64, 64, 128, 256),
        dec_num_head=(4, 4, 8, 16),
        dec_patch_size=(128, 128, 128, 128),
        drop_path=0.3,
        slot_divisors=(1, 2, 4, 8, 16),
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

optimizer = dict(type="AdamW", lr=2e-3, weight_decay=0.05)
scheduler = dict(type="OneCycleLR", pct_start=0.05, div_factor=10.0, final_div_factor=1000.0)

_transform = [
    dict(type="GridSample", grid_size=10.0, mode="train", return_grid_coord=True),  # mm
    dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("feat",)),
]

data = dict(
    num_classes=num_classes,
    ignore_index=-1,
    train=dict(
        type="PigDataset",
        split="train",
        data_root="data/pigseg",
        transform=[
            dict(type="RandomRotate", angle=[-1, 1], axis="z", p=0.5),
            dict(type="RandomScale", scale=[0.95, 1.05]),
            dict(type="RandomFlip", p=0.5),
            dict(type="ShufflePoint"),
        ] + _transform,
    ),
    val=dict(type="PigDataset", split="val", data_root="data/pigseg", transform=_transform),
)
