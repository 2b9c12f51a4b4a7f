_base_ = ["./insseg-pointgroup-v1m1-0-spunet-base.py"]
# Fine-tune PointGroup from PPT multi-dataset pretrained SpUNet weights
# (reference configs/scannet/insseg-ppt-v1m1-0-pointgroup-spunet-ft.py)

weight = "exp/multi_dataset/ppt_pretrain/model/model_best.ckpt"
hooks = [
    dict(type="CheckpointLoader", keywords="backbone.", replacement="backbone."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="InsSegEvaluator", segment_ignore_index=(-1, 0, 1), instance_ignore_index=-1),
    dict(type="CheckpointSaver"),
]
