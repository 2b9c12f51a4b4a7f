_base_ = ["./semseg-ppt-v1m1-0-sk-nu-wa-spunet.py"]
# Decoupled-head PPT over the outdoor trio (reference
# configs/semantic_kitti/semseg-ppt-v1m2-0-sk-nu-wa-spunet.py)

model = dict(
    _delete_=True,
    type="PPT-v1m2",
    conditions=("SemanticKITTI", "NuScenes", "Waymo"),
    num_classes=(19, 16, 22),
    context_channels=32,
    backbone_out_channels=96,
    backbone=dict(
        type="SpUNet-v1m3",
        in_channels=4 + 32,
        num_classes=0,
        base_channels=32,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        pdnorm_conditions=3,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)
