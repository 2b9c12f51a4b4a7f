_base_ = ["../sonata/insseg-sonata-v1m1-0a-scannet-pg-lin.py"]
# PointGroup linear probe over the frozen Concerto-large encoder on s3dis
# (reference configs/concerto/insseg-ptv3-large-v1m1-3a-s3dis-pg-lin.py)

num_classes = 13
weight = "exp/concerto/pretrain/model/model_best.ckpt"
model = dict(
    semantic_num_classes=13,
    segment_ignore_index=(-1,),
    backbone=dict(
        enc_depths=(3, 3, 3, 12, 3),
        enc_channels=(48, 96, 192, 384, 512),
        enc_num_head=(3, 6, 12, 24, 32),
    ),
    backbone_out_channels=48 + 96 + 192 + 384 + 512,
)
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

hooks = [
    dict(type="CheckpointLoader", keywords="student_backbone.", replacement="backbone."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="InsSegEvaluator", segment_ignore_index=(-1,), instance_ignore_index=-1),
    dict(type="CheckpointSaver"),
]
