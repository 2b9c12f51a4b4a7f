_base_ = ["./semseg-spunet-v1m1-0-base.py"]
# PTv1 (original vector attention) semseg on ScanNet (recipe parity:
# reference configs/scannet/semseg-pt-v1-0-base.py)

model = dict(
    _delete_=True,
    type="DefaultSegmentorV2",
    num_classes=20,
    backbone_out_channels=32,
    backbone=dict(
        type="PT-v1",
        in_channels=6,
        planes=(32, 64, 128, 256, 512),
        blocks=(2, 3, 4, 6, 3),
        strides=(1, 4, 4, 4, 4),
        nsample=(8, 16, 16, 16, 16),
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

optimizer = dict(_delete_=True, type="AdamW", lr=0.001, weight_decay=0.01)
scheduler = dict(_delete_=True, type="MultiStepLR", milestones=[0.6, 0.8], gamma=0.1)
