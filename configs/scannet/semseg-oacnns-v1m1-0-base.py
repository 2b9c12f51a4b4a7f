_base_ = ["./semseg-spunet-v1m1-0-base.py"]
# OA-CNNs (adaptive aggregation sparse CNN) semseg on ScanNet (recipe parity:
# reference configs/scannet/semseg-oacnns-v1m1-0-base.py)

model = dict(
    _delete_=True,
    type="DefaultSegmentorV2",
    num_classes=20,
    backbone_out_channels=32,
    backbone=dict(
        type="OA-CNNs",
        in_channels=6,
        base_channels=32,
        channels=(32, 64, 128, 128),
        layers=(2, 2, 2, 2),
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
)

amp = "bf16"
optimizer = dict(_delete_=True, type="AdamW", lr=0.002, weight_decay=0.02)
scheduler = dict(
    _delete_=True,
    type="OneCycleLR",
    pct_start=0.05,
    div_factor=10.0,
    final_div_factor=1000.0,
)
