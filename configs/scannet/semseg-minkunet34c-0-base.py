_base_ = ["./semseg-spunet-v1m1-0-base.py"]
# MinkUNet34C semseg (reference configs/scannet/semseg-minkunet34c-0-base.py).
# MinkUNet34C and SpUNet share the exact U-Net topology; here both names bind
# to the same gather-scatter sparse-conv implementation.

model = dict(backbone=dict(type="MinkUNet34C"))
