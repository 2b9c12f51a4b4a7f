_base_ = ["../_base_/default_runtime.py"]
# ModelNet40 shape classification with PTv3 enc-mode (recipe parity:
# reference configs/modelnet40/cls-ptv3-v1m1-0-base.py; ClsVotingTester for
# the voting protocol)

num_classes = 40
batch_size = 16
slot_size = 8192
eval_epoch = 100

model = dict(
    type="DefaultClassifier",
    num_classes=num_classes,
    backbone=dict(
        type="PT-v3m1",
        in_channels=6,  # coord + normal
        stride=(2, 2, 2, 2),
        enc_depths=(2, 2, 2, 6, 2),
        enc_channels=(32, 64, 128, 256, 512),
        enc_num_head=(2, 4, 8, 16, 32),
        enc_patch_size=(128, 128, 128, 128, 128),
        enc_mode=True,
        drop_path=0.3,
        slot_divisors=(1, 2, 4, 8, 16),
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

optimizer = dict(type="AdamW", lr=1e-3, weight_decay=0.01)
scheduler = dict(type="OneCycleLR", pct_start=0.05, div_factor=10.0, final_div_factor=1000.0)

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="ClsEvaluator"),
    dict(type="CheckpointSaver"),
]

test = dict(type="ClsVotingTester", num_repeat=10)

_transform = [
    dict(type="NormalizeCoord"),
    dict(type="GridSample", grid_size=0.01, mode="train", return_grid_coord=True),
    dict(type="Collect", keys=("coord", "grid_coord", "category"), feat_keys=("coord", "normal")),
]

data = dict(
    num_classes=num_classes,
    train=dict(
        type="ModelNetDataset",
        split="train",
        data_root="data/modelnet40",
        transform=[
            dict(type="RandomRotate", angle=[-1, 1], axis="z", p=0.5),
            dict(type="RandomScale", scale=[0.9, 1.1]),
            dict(type="ShufflePoint"),
        ] + _transform,
    ),
    val=dict(type="ModelNetDataset", split="test", data_root="data/modelnet40", transform=_transform),
    test=dict(
        type="ModelNetDataset",
        split="test",
        data_root="data/modelnet40",
        test_mode=True,
        transform=[dict(type="NormalizeCoord")],
        test_cfg=dict(
            post_transform=_transform[1:],
            aug_transform=[[dict(type="RandomScale", scale=[0.95, 1.05])]],
        ),
    ),
)
