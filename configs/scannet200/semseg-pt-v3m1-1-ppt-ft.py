_base_ = ["./semseg-pt-v3m1-0-base.py"]
# Fine-tune a PPT-pretrained PTv3 on ScanNet200 (reference
# configs/scannet200/semseg-pt-v3m1-1-ppt-ft.py): load multi-dataset
# pretrained backbone weights, train the full model on the 200-class task.

weight = "exp/multi_dataset/ppt_pretrain/model/model_best.ckpt"
hooks = [
    dict(type="CheckpointLoader", keywords="backbone.", replacement="backbone."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver"),
]
