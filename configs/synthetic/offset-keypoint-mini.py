_base_ = ["../_base_/default_runtime.py"]
# mini synthetic offset-keypoint config (the config-#2 smoke path)

num_keypoints = 6
batch_size = 4
slot_size = 1024
eval_epoch = 3

model = dict(
    type="OffsetKeypointPTv3",
    num_keypoints=num_keypoints,
    hidden_dim=64,
    backbone_conf=dict(
        type="PT-v3m1",
        in_channels=4,
        stride=(2, 2),
        enc_depths=(1, 1, 1),
        enc_channels=(16, 32, 64),
        enc_num_head=(2, 4, 4),
        enc_patch_size=(32, 32, 32),
        dec_depths=(1, 1),
        dec_channels=(16, 32),
        dec_num_head=(2, 4),
        dec_patch_size=(32, 32),
        mlp_ratio=2,
        drop_path=0.1,
        slot_divisors=(1, 2, 4),
        stem_kernel=3,
    ),
)

optimizer = dict(type="AdamW", lr=2e-3, weight_decay=0.01)
scheduler = dict(type="CosineAnnealingLR", eta_min=1e-5)

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="OffsetKeypointEvaluator"),
    dict(type="CheckpointSaver"),
]

data = dict(
    num_classes=num_keypoints,
    train=dict(
        type="SyntheticKeypointDataset",
        split="train",
        num_scenes=8,
        num_points=1500,
        num_keypoints=num_keypoints,
        offset_radius=300.0,
        loop=4,
        transform=[
            dict(type="GridSample", grid_size=0.02, mode="train", return_grid_coord=True),
            dict(type="ShufflePoint"),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "keypoint_offset", "keypoint_mask", "scale", "centroid"),
                 feat_keys=("feat",)),
        ],
    ),
    val=dict(
        type="SyntheticKeypointDataset",
        split="val",
        num_scenes=4,
        num_points=1500,
        num_keypoints=num_keypoints,
        offset_radius=300.0,
        transform=[
            dict(type="GridSample", grid_size=0.02, mode="train", return_grid_coord=True),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "keypoint_offset", "keypoint_mask", "scale", "centroid"),
                 feat_keys=("feat",)),
        ],
    ),
)
