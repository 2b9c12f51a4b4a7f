_base_ = ["../scannet/insseg-pointgroup-v1m1-0-spunet-base.py"]
# PointGroup on S3DIS (reference
# configs/s3dis/insseg-pointgroup-v1m1-0-spunet-base.py)

num_classes = 13
model = dict(
    semantic_num_classes=13,
    segment_ignore_index=(-1,),
)
hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="InsSegEvaluator", segment_ignore_index=(-1,), instance_ignore_index=-1),
    dict(type="CheckpointSaver"),
]
data = dict(
    num_classes=13,
    train=dict(
        type="S3DISDataset",
        split=("Area_1", "Area_2", "Area_3", "Area_4", "Area_6"),
        data_root="data/s3dis",
    ),
    val=dict(type="S3DISDataset", split="Area_5", data_root="data/s3dis"),
    test=dict(type="S3DISDataset", split="Area_5", data_root="data/s3dis"),
)
