_base_ = ["../sonata/semseg-sonata-v1m1-0b-scannet-dec.py"]
# Concerto-base dec probe on scannet200 (reference configs/concerto/semseg-ptv3-base-v1m1-1b-scannet200-dec.py)

num_classes = 200
weight = "exp/concerto/pretrain/model/model_best.ckpt"
model = dict(num_classes=200)
data = dict(
    num_classes=200,
    train=dict(type="ScanNet200Dataset"),
    val=dict(type="ScanNet200Dataset"),
    test=dict(type="ScanNet200Dataset"),
)
