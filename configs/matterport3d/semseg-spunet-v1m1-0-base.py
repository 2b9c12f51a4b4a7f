_base_ = ["../scannet/semseg-spunet-v1m1-0-base.py"]
# SpUNet semseg on Matterport3D (recipe parity: reference
# configs/matterport3d/semseg-spunet-v1m1-0-base.py — 21 classes)

num_classes = 21

model = dict(
    backbone=dict(num_classes=21),
)

data = dict(
    num_classes=21,
    train=dict(type="Matterport3DDataset", data_root="data/matterport3d"),
    val=dict(type="Matterport3DDataset", data_root="data/matterport3d"),
    test=dict(type="Matterport3DDataset", data_root="data/matterport3d"),
)
