_base_ = ["./semseg-spunet-v1m1-0-base.py"]
# MinkUNet34C semseg (reference configs/scannet/semseg-minkunet34c-0-base.py).
# Standalone ME-style ResNet U-Net (models/mink_unet.py): two-stage stem,
# block stages at strides 2/4/8/16, full-res stem skip in the last decoder stage.

model = dict(
    backbone=dict(
        _delete_=True,
        type="MinkUNet34C",
        in_channels=6,
        num_classes=20,
    ),
)
