_base_ = ["../scannet/semseg-spunet-v1m1-0-base.py"]
# SpUNet semseg on ScanNet200 (recipe parity: reference
# configs/scannet200/semseg-spunet-v1m1-0-base.py)

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
