_base_ = ["./semseg-spunet-v1m1-0-base.py"]
# MinkUNet34C on ScanNet200 (reference
# configs/scannet200/semseg-minkunet34c-0-base.py); same topology as SpUNet.

model = dict(
    backbone=dict(
        _delete_=True,
        type="MinkUNet34C",
        in_channels=6,
        num_classes=200,
    ),
)
