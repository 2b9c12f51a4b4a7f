_base_ = ["./semseg-pt-v2m2-0-base.py"]
# PTv2 "origin" recipe (reference configs/scannet/semseg-pt-v2m1-0-origin.py)

model = dict(backbone=dict(type="PT-v2m1"))
optimizer = dict(lr=0.006)
