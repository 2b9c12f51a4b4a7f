_base_ = ["../scannet/semseg-pt-v3m1-0-base.py"]
# PTv3 semseg on ScanNet200 (recipe parity: reference
# configs/scannet200/semseg-pt-v3m1-0-base.py — 200 fine-grained classes)

num_classes = 200

model = dict(
    num_classes=200,
)

data = dict(
    num_classes=200,
    train=dict(type="ScanNet200Dataset", data_root="data/scannet"),
    val=dict(type="ScanNet200Dataset", data_root="data/scannet"),
    test=dict(type="ScanNet200Dataset", data_root="data/scannet"),
)
