_base_ = ["./semseg-spunet-v1m1-0-base.py"]
# Precise-eval variant (parity: reference
# configs/scannet/semseg-spunet-v1m1-1-precise-eval.py): after training,
# PreciseEvaluator runs the full TTA fragment tester on the best checkpoint.

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver"),
    dict(type="PreciseEvaluator", test_last=False),
]
