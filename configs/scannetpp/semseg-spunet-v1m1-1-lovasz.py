_base_ = ["./semseg-spunet-v1m1-0-base.py"]
# SpUNet + Lovasz on ScanNet++ (reference
# configs/scannetpp/semseg-spunet-v1m1-1-lovasz.py)

model = dict(
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
)
