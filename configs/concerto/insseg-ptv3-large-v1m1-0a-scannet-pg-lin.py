_base_ = ["../sonata/insseg-sonata-v1m1-0a-scannet-pg-lin.py"]
# PointGroup linear probe over the frozen Concerto-large encoder on scannet
# (reference configs/concerto/insseg-ptv3-large-v1m1-0a-scannet-pg-lin.py)

num_classes = 20
weight = "exp/concerto/pretrain/model/model_best.ckpt"
model = dict(
    semantic_num_classes=20,
    segment_ignore_index=(-1,0,1),
    backbone=dict(
        enc_depths=(3, 3, 3, 12, 3),
        enc_channels=(48, 96, 192, 384, 512),
        enc_num_head=(3, 6, 12, 24, 32),
    ),
    backbone_out_channels=48 + 96 + 192 + 384 + 512,
)
data = dict(
    num_classes=20,
    train=dict(type="ScanNetDataset"),
    val=dict(type="ScanNetDataset"),
    test=dict(type="ScanNetDataset"),
)
