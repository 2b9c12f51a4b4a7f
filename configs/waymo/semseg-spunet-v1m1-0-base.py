_base_ = ["./semseg-pt-v3m1-0-base.py"]
# SpUNet on Waymo (reference configs/waymo/semseg-spunet-v1m1-0-base.py)

model = dict(
    _delete_=True,
    type="DefaultSegmentor",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=4,
        num_classes=22,
        base_channels=32,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

optimizer = dict(_delete_=True, type="SGD", lr=0.24, momentum=0.9, weight_decay=1e-4, nesterov=True)
scheduler = dict(
    _delete_=True,
    type="OneCycleLR",
    pct_start=0.04,
    div_factor=10.0,
    final_div_factor=100.0,
)
