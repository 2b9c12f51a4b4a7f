_base_ = ["./semseg-spunet-v1m1-0-base.py"]
# OctFormer (dilated octree attention) semseg on ScanNet (recipe parity:
# reference configs/scannet/semseg-octformer-v1m1-0-base.py)

model = dict(
    _delete_=True,
    type="DefaultSegmentorV2",
    num_classes=20,
    backbone_out_channels=96,
    backbone=dict(
        type="OctFormer-v1m1",
        in_channels=6,
        channels=(96, 192, 384, 384),
        num_blocks=(2, 2, 6, 2),
        num_heads=(6, 12, 24, 24),
        patch_size=32,
        dilation=4,
        drop_path_rate=0.5,
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
)

amp = "bf16"
optimizer = dict(_delete_=True, type="AdamW", lr=0.0015, weight_decay=0.05)
scheduler = dict(
    _delete_=True,
    type="OneCycleLR",
    pct_start=0.05,
    div_factor=10.0,
    final_div_factor=1000.0,
)
