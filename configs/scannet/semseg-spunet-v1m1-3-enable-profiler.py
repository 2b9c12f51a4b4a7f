_base_ = ["./semseg-spunet-v1m1-0-base.py"]
# Profiler-enabled variant (parity: reference
# configs/scannet/semseg-spunet-v1m1-3-enable-profiler.py): jax.profiler
# trace of a few warmup steps into save_path, then exit.

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="RuntimeProfiler", warm_up=2, record=4),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver"),
]
