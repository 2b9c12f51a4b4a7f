_base_ = ["./semseg-spunet-v1m1-0-base.py"]
# StratifiedTransformer (dense local + sparse distant keys) semseg on ScanNet
# (recipe parity: reference configs/scannet/semseg-st-v1m2-0-refined.py)

model = dict(
    _delete_=True,
    type="DefaultSegmentorV2",
    num_classes=20,
    backbone_out_channels=48,
    backbone=dict(
        type="ST-v1m2",
        in_channels=6,
        channels=(48, 96, 192, 384),
        depths=(2, 2, 6, 2),
        num_heads=(3, 6, 12, 24),
        patch_size=32,
        super_ratio=4,
        drop_path_rate=0.3,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

amp = "bf16"
optimizer = dict(_delete_=True, type="AdamW", lr=0.006, weight_decay=0.05)
scheduler = dict(
    _delete_=True,
    type="MultiStepWithWarmupLR",
    milestones=[0.6, 0.8],
    gamma=0.1,
    warmup_rate=0.05,
    warmup_scale=1e-6,
)
