_base_ = ["./semseg-spunet-v1m1-0-base.py"]
# MinkUNet34C on S3DIS (reference configs/s3dis/semseg-minkunet34c-0-base.py)

model = dict(
    backbone=dict(
        _delete_=True,
        type="MinkUNet34C",
        in_channels=6,
        num_classes=13,
    ),
)
