_base_ = ["./semseg-pt-v2m2-0-base.py"]
# PTv2 + Lovasz on ScanNet++ (reference
# configs/scannetpp/semseg-pt-v2m2-1-lovasz.py)

model = dict(
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
)
