_base_ = ["../scannet/insseg-pointgroup-v1m1-0-spunet-base.py"]
# PointGroup instance seg on ScanNet200 (reference
# configs/scannet200/insseg-pointgroup-spunet-0-base.py)

num_classes = 200
model = dict(
    semantic_num_classes=200,
    segment_ignore_index=(-1, 0, 2),  # wall, floor in the 200-class order
)
hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="InsSegEvaluator", segment_ignore_index=(-1, 0, 2), instance_ignore_index=-1),
    dict(type="CheckpointSaver"),
]
data = dict(
    num_classes=200,
    train=dict(type="ScanNet200Dataset"),
    val=dict(type="ScanNet200Dataset"),
    test=dict(type="ScanNet200Dataset"),
)
