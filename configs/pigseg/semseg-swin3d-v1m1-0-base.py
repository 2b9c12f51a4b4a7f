_base_ = ["./semseg-ptv3-v1m1-0-base.py"]
# Pig semseg with Swin3D (parity: reference configs/pigseg/semseg-swin3d-v1m1-0-base.py)

model = dict(
    _delete_=True,
    type="DefaultSegmentorV2",
    num_classes=2,
    backbone_out_channels=48,
    backbone=dict(
        type="Swin3D-v1m1",
        in_channels=4,
        depths=(2, 2, 6, 2),
        channels=(48, 96, 192, 384),
        num_heads=(3, 6, 12, 24),
        window_sizes=(4, 4, 4, 4),
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)
