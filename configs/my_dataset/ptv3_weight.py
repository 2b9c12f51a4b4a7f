_base_ = ["../_base_/default_runtime.py"]
# Pig body-measure/weight regression (parity: reference
# configs/my_dataset/ptv3_weight.py — PTv3 backbone, 7-dim regression with
# per-measure real-unit MAE logging via PigBodyRegressor).

batch_size = 8
slot_size = 8192
eval_epoch = 100
evaluate = False

model = dict(
    type="PigBodyRegressor",
    num_measures=7,
    backbone=dict(
        type="PT-v3m1",
        in_channels=4,
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
    criteria=[dict(type="RegressionL1Loss")],
)

optimizer = dict(type="AdamW", lr=1e-3, weight_decay=0.05)
scheduler = dict(type="CosineAnnealingLR", eta_min=1e-5)

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="CheckpointSaver"),
]

_transform = [
    dict(type="GridSample", grid_size=10.0, mode="train", return_grid_coord=True),  # mm units
    dict(type="Collect", keys=("coord", "grid_coord", "weight_label"), feat_keys=("feat",)),
]

data = dict(
    train=dict(
        type="PigWeightDataset",
        split="train",
        data_root="data/pig_weight",
        transform=[dict(type="ShufflePoint")] + _transform,
    ),
    val=dict(
        type="PigWeightDataset",
        split="val",
        data_root="data/pig_weight",
        transform=_transform,
    ),
)
