_base_ = ["./semseg-ptv3-v1m1-0-base.py"]
# Pig semseg with OctFormer (parity: reference configs/pigseg/semseg-octformer-v1m1-0-base.py)

model = dict(
    _delete_=True,
    type="DefaultSegmentorV2",
    num_classes=2,
    backbone_out_channels=96,
    backbone=dict(
        type="OctFormer-v1m1",
        in_channels=4,
        channels=(96, 192, 384, 384),
        num_blocks=(2, 2, 6, 2),
        num_heads=(6, 12, 24, 24),
        patch_size=32,
        dilation=4,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)
