_base_ = ["./semseg-spunet-v1m1-0-base.py"]
# SpUNet-v1m3: backbone-internal PDNorm (per-dataset-condition norm tables at
# every normalization site; parity: reference
# configs/scannet/semseg-spunet-v1m3-0-pdnorm-base.py)

model = dict(
    _delete_=True,
    type="DefaultSegmentor",
    backbone=dict(
        type="SpUNet-v1m3",
        in_channels=6,
        num_classes=20,
        base_channels=32,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        pdnorm_conditions=3,  # ScanNet / S3DIS / Structured3D
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)
