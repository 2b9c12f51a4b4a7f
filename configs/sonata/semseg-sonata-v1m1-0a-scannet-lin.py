_base_ = ["../scannet/semseg-pt-v3m1-0-base.py"]
# Linear probe of a Sonata-pretrained encoder on ScanNet (reference
# configs/sonata/semseg-sonata-v1m1-0a-scannet-lin.py): the PT-v3m2 enc-mode
# backbone is frozen, only the linear seg head trains.

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
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver"),
]
optimizer = dict(freeze_all_except="seg_head")
eval_epoch = 50
