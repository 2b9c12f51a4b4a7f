_base_ = ["./semseg-spunet-v1m1-0-base.py"]
# Fine-tune from an SSL-pretrained SpUNet (parity: reference
# configs/scannet/semseg-spunet-v1m1-4-ft.py): CheckpointLoader rewrites
# checkpoint keys (keywords -> replacement) and loads non-strict.

eval_epoch = 100
weight = "exp/scannet/pretrain-msc/model/model_best.ckpt"

hooks = [
    dict(type="CheckpointLoader", keywords="backbone.", replacement="backbone."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver"),
]
