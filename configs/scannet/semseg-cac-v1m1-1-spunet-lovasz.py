_base_ = ["./semseg-cac-v1m1-0-spunet-base.py"]
# CAC + Lovasz (reference configs/scannet/semseg-cac-v1m1-1-spunet-lovasz.py)

model = dict(
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
)
