_base_ = ["../scannet/semseg-spunet-v1m1-0-base.py"]
# SpUNet semseg on Structured3D (recipe parity: reference
# configs/structured3d/semseg-spunet-v1m1-0-base.py — 25 classes)

num_classes = 25

model = dict(
    backbone=dict(num_classes=25),
)

data = dict(
    num_classes=25,
    train=dict(type="Structured3DDataset", data_root="data/structured3d",
               split=("train", "test")),
    val=dict(type="Structured3DDataset", data_root="data/structured3d", split="val"),
    test=dict(type="Structured3DDataset", data_root="data/structured3d", split="val"),
)
