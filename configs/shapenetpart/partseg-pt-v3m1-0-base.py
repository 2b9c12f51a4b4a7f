_base_ = ["../_base_/default_runtime.py"]
# ShapeNetPart part segmentation (capability parity: reference ShapeNetPart
# dataset + PartSegTester — 50 part labels over 16 categories)

num_classes = 50
batch_size = 16
slot_size = 4096
eval_epoch = 100

model = dict(
    type="DefaultSegmentorV2",
    num_classes=num_classes,
    backbone_out_channels=32,
    backbone=dict(
        type="PT-v3m1",
        in_channels=6,  # coord + normal
        stride=(2, 2),
        enc_depths=(2, 2, 2),
        enc_channels=(32, 64, 128),
        enc_num_head=(2, 4, 8),
        enc_patch_size=(128, 128, 128),
        dec_depths=(2, 2),
        dec_channels=(32, 64),
        dec_num_head=(2, 4),
        dec_patch_size=(128, 128),
        drop_path=0.3,
        slot_divisors=(1, 2, 4),
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

optimizer = dict(type="AdamW", lr=1e-3, weight_decay=0.05)
scheduler = dict(type="CosineAnnealingLR", eta_min=1e-5)

test = dict(type="PartSegTester")

_transform = [
    dict(type="NormalizeCoord"),
    dict(type="GridSample", grid_size=0.01, mode="train", return_grid_coord=True),
    dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("coord", "normal")),
]

data = dict(
    num_classes=num_classes,
    ignore_index=-1,
    train=dict(
        type="ShapeNetPartDataset",
        split="train",
        data_root="data/shapenetpart",
        transform=[
            dict(type="RandomRotate", angle=[-1, 1], axis="z", p=0.5),
            dict(type="RandomScale", scale=[0.9, 1.1]),
            dict(type="ShufflePoint"),
        ] + _transform,
    ),
    val=dict(type="ShapeNetPartDataset", split="val", data_root="data/shapenetpart", transform=_transform),
)
