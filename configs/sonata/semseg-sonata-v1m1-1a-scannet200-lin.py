_base_ = ["./semseg-sonata-v1m1-0a-scannet-lin.py"]
# Sonata linear probe on ScanNet200 (reference
# configs/sonata/semseg-sonata-v1m1-1a-scannet200-lin.py)

num_classes = 200
model = dict(num_classes=200)
data = dict(
    num_classes=200,
    train=dict(type="ScanNet200Dataset"),
    val=dict(type="ScanNet200Dataset"),
    test=dict(type="ScanNet200Dataset"),
)
