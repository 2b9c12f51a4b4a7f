_base_ = ["./semseg-spunet-v1m1-0-base.py"]
# SPVCNN on SemanticKITTI (reference
# configs/semantic_kitti/semseg-spvcnn-v1m1-0-base.py)

model = dict(
    _delete_=True,
    type="DefaultSegmentor",
    backbone=dict(
        type="SPVCNN",
        in_channels=4,
        num_classes=19,
        base_channels=32,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)
