_base_ = ["./insseg-pointgroup-v1m1-0-spunet-base.py"]
# SGIFormer query-based instance segmentation on ScanNet (parity surface:
# reference pointcept/models/sgiformer — Hungarian-matched mask transformer)

model = dict(
    _delete_=True,
    type="SGIFormer-v1m1",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=0,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
    ),
    num_classes=18,
    num_sample_query=100,
    num_learn_query=100,
    dec_dim=128,
    dec_layers=3,
    segment_ignore_index=(-1, 0, 1),
)

amp = "bf16"
optimizer = dict(_delete_=True, type="AdamW", lr=0.0002, weight_decay=0.05)
scheduler = dict(_delete_=True, type="PolyLR", power=0.9)
