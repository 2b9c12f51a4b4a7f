_base_ = ["./semseg-st-v1m2-0-refined.py"]
# StratifiedTransformer "origin" recipe (reference
# configs/scannet/semseg-st-v1m1-0-origin.py)

model = dict(backbone=dict(type="ST-v1m1"))
optimizer = dict(lr=0.006)
