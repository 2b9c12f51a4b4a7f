_base_ = ["../scannet/insseg-pointgroup-v1m2-0-ptv3-base.py"]
# PointGroup over a frozen Sonata encoder, linear probe (reference
# configs/sonata/insseg-sonata-v1m1-0a-scannet-pg-lin.py)

model = dict(
    backbone=dict(
        type="PT-v3m2",
        enc_mode=True,
        upcast_level=4,
    ),
    backbone_out_channels=32 + 64 + 128 + 256 + 512,
)
weight = "exp/sonata/pretrain/model/model_best.ckpt"
hooks = [
    dict(type="CheckpointLoader", keywords="student_backbone.", replacement="backbone."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="InsSegEvaluator", segment_ignore_index=(-1, 0, 1), instance_ignore_index=-1),
    dict(type="CheckpointSaver"),
]
optimizer = dict(freeze_all_except=("seg_head", "mask_head", "offset_head"))
