_base_ = ["../sonata/semseg-sonata-v1m1-0c-scannet-ft.py"]
# Concerto-large ft probe on scannet200 (reference configs/concerto/semseg-ptv3-large-v1m1-1c-scannet200-ft.py)

num_classes = 200
weight = "exp/concerto/pretrain/model/model_best.ckpt"
model = dict(
    num_classes=200,
    backbone=dict(
        enc_depths=(3, 3, 3, 12, 3),
        enc_channels=(48, 96, 192, 384, 512),
        enc_num_head=(3, 6, 12, 24, 32),
    ),
)
data = dict(
    num_classes=200,
    train=dict(type="ScanNet200Dataset"),
    val=dict(type="ScanNet200Dataset"),
    test=dict(type="ScanNet200Dataset"),
)
