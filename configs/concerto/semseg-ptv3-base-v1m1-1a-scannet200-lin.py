_base_ = ["../sonata/semseg-sonata-v1m1-0a-scannet-lin.py"]
# Concerto-base lin probe on scannet200 (reference configs/concerto/semseg-ptv3-base-v1m1-1a-scannet200-lin.py)

num_classes = 200
weight = "exp/concerto/pretrain/model/model_best.ckpt"
model = dict(num_classes=200)
data = dict(
    num_classes=200,
    train=dict(type="ScanNet200Dataset"),
    val=dict(type="ScanNet200Dataset"),
    test=dict(type="ScanNet200Dataset"),
)
