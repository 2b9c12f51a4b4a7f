_base_ = ["../scannet/semseg-minkunet34c-0-base.py"]
# MinkUNet34C on ScanNet200 (reference
# configs/scannet200/semseg-minkunet34c-0-base.py); inherits the ScanNet
# MinkUNet recipe (coord+color+normal features, in_channels=9) and swaps the
# dataset + class count.

num_classes = 200

model = dict(
    backbone=dict(num_classes=200),
)

data = dict(
    num_classes=200,
    train=dict(type="ScanNet200Dataset", data_root="data/scannet"),
    val=dict(type="ScanNet200Dataset", data_root="data/scannet"),
    test=dict(type="ScanNet200Dataset", data_root="data/scannet"),
)
