_base_ = ["./semseg-ptv3-base.py"]
# Mini-SemanticKITTI Swin3D smoke config (parity: reference
# configs/semantic_kitti/semseg-swin3d-mini.py — the SLAM-bridge training
# recipe: 19 classes, 0.2 grid, bs1, mini dataset from
# tools/make_mini_dataset.py)

batch_size = 1
slot_size = 32768
eval_epoch = 20

model = dict(
    _delete_=True,
    type="DefaultSegmentorV2",
    num_classes=19,
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

_transform = [
    dict(type="PointClip", point_cloud_range=(-75.2, -75.2, -4, 75.2, 75.2, 2)),
    dict(type="GridSample", grid_size=0.2, hash_type="fnv", mode="train", return_grid_coord=True),
    dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("coord", "strength")),
]

data = dict(
    train=dict(data_root="data/mini_semantic_kitti", transform=_transform),
    val=dict(data_root="data/mini_semantic_kitti", transform=_transform),
)
