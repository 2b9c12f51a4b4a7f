_base_ = ["./semseg-spunet-v1m1-0-base.py"]
# PointGroup instance segmentation on ScanNet (recipe parity: reference
# configs/scannet/insseg-pointgroup-v1m1-0-spunet-base.py)

model = dict(
    _delete_=True,
    type="PG-v1m1",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=0,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
    ),
    backbone_out_channels=96,
    semantic_num_classes=20,
    semantic_ignore_index=-1,
    segment_ignore_index=(-1, 0, 1),
    instance_ignore_index=-1,
    cluster_thresh=1.5,
    voxel_size=0.02,
)

epoch = 800
optimizer = dict(_delete_=True, type="SGD", lr=0.05, momentum=0.9, weight_decay=1e-4, nesterov=True)
scheduler = dict(_delete_=True, type="PolyLR", power=0.9)

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="InsSegEvaluator", segment_ignore_index=(-1, 0, 1), instance_ignore_index=-1),
    dict(type="CheckpointSaver"),
]

data = dict(
    train=dict(
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="RandomDropout", dropout_ratio=0.2, dropout_application_ratio=0.2),
            dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
            dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="x", p=0.5),
            dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="y", p=0.5),
            dict(type="RandomScale", scale=[0.9, 1.1]),
            dict(type="RandomFlip", p=0.5),
            dict(type="RandomJitter", sigma=0.005, clip=0.02),
            dict(type="ElasticDistortion", distortion_params=[[0.2, 0.4], [0.8, 1.6]]),
            dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
            dict(type="ChromaticTranslation", p=0.95, ratio=0.05),
            dict(type="ChromaticJitter", p=0.95, std=0.05),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train",
                 return_grid_coord=True),
            dict(type="SphereCrop", point_max=100000, mode="random"),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="InstanceParser", segment_ignore_index=(-1, 0, 1), instance_ignore_index=-1),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "segment", "instance", "instance_centroid"),
                 feat_keys=("color", "normal")),
        ],
    ),
    val=dict(
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train",
                 return_grid_coord=True),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="InstanceParser", segment_ignore_index=(-1, 0, 1), instance_ignore_index=-1),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "segment", "instance", "instance_centroid"),
                 feat_keys=("color", "normal")),
        ],
    ),
)
