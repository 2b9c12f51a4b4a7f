_base_ = ["./semseg-sonata-v1m1-0b-scannet-dec.py"]
# Sonata dec probe on scannet200 (reference configs/sonata/semseg-sonata-v1m1-1b-scannet200-dec.py)

num_classes = 200
model = dict(num_classes=200)
data = dict(
    num_classes=200,
    train=dict(type="ScanNet200Dataset"),
    val=dict(type="ScanNet200Dataset"),
    test=dict(type="ScanNet200Dataset"),
)
