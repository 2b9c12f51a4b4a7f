_base_ = ["./semseg-spunet-v1m1-0-base.py"]
# Swin3D-S (windowed sparse attention + cRSE) semseg on ScanNet (recipe
# parity: reference configs/scannet/semseg-swin3d-v1m1-0-small.py)

model = dict(
    _delete_=True,
    type="DefaultSegmentorV2",
    num_classes=20,
    backbone_out_channels=48,
    backbone=dict(
        type="Swin3D-v1m1",
        in_channels=6,
        depths=(2, 2, 6, 2),
        channels=(48, 96, 192, 384),
        num_heads=(3, 6, 12, 24),
        window_sizes=(4, 4, 4, 4),
        drop_path_rate=0.3,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

amp = "bf16"
optimizer = dict(_delete_=True, type="AdamW", lr=0.001, weight_decay=0.05)
scheduler = dict(
    _delete_=True,
    type="OneCycleLR",
    pct_start=0.05,
    div_factor=10.0,
    final_div_factor=1000.0,
)
