_base_ = ["../_base_/default_runtime.py"]
# Global-regression keypoint head on PTv3 (parity: reference
# configs/my_dataset/keypoint_ptv3.py — pig body keypoints, 6 x 3 targets,
# MSE in normalized space, de-normalized mm distance logging).

num_keypoints = 6
batch_size = 8
slot_size = 8192
eval_epoch = 100

model = dict(
    type="KeypointPTv3",
    num_keypoints=num_keypoints,
    hidden_dim=256,
    backbone_conf=dict(
        type="PT-v3m1",
        in_channels=4,  # normal + curvature
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        stride=(2, 2, 2, 2),
        enc_depths=(2, 2, 2, 6, 2),
        enc_channels=(32, 64, 128, 256, 512),
        enc_num_head=(2, 4, 8, 16, 32),
        enc_patch_size=(128, 128, 128, 128, 128),
        dec_depths=(2, 2, 2, 2),
        dec_channels=(64, 64, 128, 256),
        dec_num_head=(4, 4, 8, 16),
        dec_patch_size=(128, 128, 128, 128),
        mlp_ratio=4,
        drop_path=0.3,
        slot_divisors=(1, 2, 4, 8, 16),
    ),
)

optimizer = dict(type="AdamW", lr=1e-3, weight_decay=0.05)
scheduler = dict(type="CosineAnnealingLR", eta_min=1e-5)

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="KeypointEvaluator"),
    dict(type="CheckpointSaver"),
]

_transform = [
    dict(type="GridSample", grid_size=0.02, mode="train", return_grid_coord=True),
    dict(type="Collect",
         keys=("coord", "grid_coord", "keypoint", "scale", "centroid"),
         feat_keys=("feat",)),
]

data = dict(
    num_classes=num_keypoints,
    train=dict(
        type="KeypointDataset",
        split="train",
        data_root="data/pig_keypoint",
        num_keypoints=num_keypoints,
        transform=[dict(type="ShufflePoint")] + _transform,
    ),
    val=dict(
        type="KeypointDataset",
        split="val",
        data_root="data/pig_keypoint",
        num_keypoints=num_keypoints,
        transform=_transform,
    ),
)
