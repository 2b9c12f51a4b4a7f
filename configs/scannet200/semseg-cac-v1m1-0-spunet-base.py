_base_ = ["../scannet/semseg-cac-v1m1-0-spunet-base.py"]
# CAC on ScanNet200 (reference configs/scannet200/semseg-cac-v1m1-0-spunet-base.py)

num_classes = 200
model = dict(num_classes=200)
data = dict(
    num_classes=200,
    train=dict(type="ScanNet200Dataset"),
    val=dict(type="ScanNet200Dataset"),
    test=dict(type="ScanNet200Dataset"),
)
