_base_ = ["./semseg-pt-v2m2-0-base.py"]
# PTv2 + Lovasz on S3DIS (reference configs/s3dis/semseg-pt-v2m2-0-lovasz.py)

model = dict(
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
)
