_base_ = ["../scannet/semseg-st-v1m2-0-refined.py"]
# StratifiedTransformer on ScanNet200 (reference
# configs/scannet200/semseg-st-v1m2-0-refined.py)

num_classes = 200
model = dict(num_classes=200)
data = dict(
    num_classes=200,
    train=dict(type="ScanNet200Dataset"),
    val=dict(type="ScanNet200Dataset"),
    test=dict(type="ScanNet200Dataset"),
)
