_base_ = ["../scannet/semseg-pt-v1-0-base.py"]
# PTv1 on ScanNet200 (reference configs/scannet200/semseg-pt-v1-0-base.py)

num_classes = 200
model = dict(num_classes=200)
data = dict(
    num_classes=200,
    train=dict(type="ScanNet200Dataset"),
    val=dict(type="ScanNet200Dataset"),
    test=dict(type="ScanNet200Dataset"),
)
