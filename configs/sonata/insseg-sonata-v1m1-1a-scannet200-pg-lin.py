_base_ = ["./insseg-sonata-v1m1-0a-scannet-pg-lin.py"]
# PointGroup linear probe over frozen Sonata encoder on scannet200 (reference
# configs/sonata/insseg-sonata-v1m1-1a-scannet200-pg-lin.py)

num_classes = 200
model = dict(
    semantic_num_classes=200,
    segment_ignore_index=(-1,0,2),
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
