_base_ = ["../sonata/insseg-sonata-v1m1-0a-scannet-pg-lin.py"]
# PointGroup linear probe over the frozen Concerto-large encoder on scannet200
# (reference configs/concerto/insseg-ptv3-large-v1m1-1a-scannet200-pg-lin.py)

num_classes = 200
weight = "exp/concerto/pretrain/model/model_best.ckpt"
model = dict(
    semantic_num_classes=200,
    segment_ignore_index=(-1,0,2),
    backbone=dict(
        enc_depths=(3, 3, 3, 12, 3),
        enc_channels=(48, 96, 192, 384, 512),
        enc_num_head=(3, 6, 12, 24, 32),
    ),
    backbone_out_channels=48 + 96 + 192 + 384 + 512,
)
data = dict(
    num_classes=200,
    train=dict(type="ScanNet200Dataset"),
    val=dict(type="ScanNet200Dataset"),
    test=dict(type="ScanNet200Dataset"),
)

hooks = [
    dict(type="CheckpointLoader", keywords="student_backbone.", replacement="backbone."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="InsSegEvaluator", segment_ignore_index=(-1, 0, 2), instance_ignore_index=-1),
    dict(type="CheckpointSaver"),
]
