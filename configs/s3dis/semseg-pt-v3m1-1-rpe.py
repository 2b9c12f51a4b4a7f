_base_ = ["./semseg-pt-v3m1-0-base.py"]
# PTv3 with relative position encoding instead of xCPE-only (reference
# configs/s3dis/semseg-pt-v3m1-1-rpe.py)

model = dict(backbone=dict(enable_rpe=True))
