_base_ = ["../scannet/semseg-pt-v2m2-0-base.py"]
# PTv2 on ScanNet200 (reference configs/scannet200/semseg-pt-v2m2-0-base.py)

num_classes = 200
model = dict(num_classes=200)
data = dict(
    num_classes=200,
    train=dict(type="ScanNet200Dataset"),
    val=dict(type="ScanNet200Dataset"),
    test=dict(type="ScanNet200Dataset"),
)
