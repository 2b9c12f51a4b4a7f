_base_ = ["../scannet/semseg-ppt-v1m1-0-sc-st-spunet.py"]
# PPT language-guided S3DIS + ScanNet + Structured3D, validated on S3DIS
# (reference configs/s3dis/semseg-ppt-v1m1-0-s3-sc-st-spunet.py)

model = dict(
    conditions=("S3DIS", "ScanNet", "Structured3D"),
    num_classes=(13, 20, 25),
    backbone=dict(pdnorm_conditions=3),
)
_common_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.005, clip=0.02),
    dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
    dict(type="ChromaticTranslation", p=0.95, ratio=0.05),
    dict(type="ChromaticJitter", p=0.95, std=0.05),
    dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train", return_grid_coord=True),
    dict(type="SphereCrop", point_max=100000, mode="random"),
    dict(type="CenterShift", apply_z=False),
    dict(type="NormalizeColor"),
    dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("color", "normal")),
]

data = dict(
    num_classes=13,
    train=dict(
        datasets=[
            dict(
                type="S3DISDataset",
                split=("Area_1", "Area_2", "Area_3", "Area_4", "Area_6"),
                data_root="data/s3dis",
                condition=0,
                loop=2,
                transform=_common_transform,
            ),
            dict(type="ScanNetDataset", split="train", data_root="data/scannet",
                 condition=1, loop=1, transform=_common_transform),
            dict(type="Structured3DDataset", split=("train", "test"),
                 data_root="data/structured3d", condition=2, loop=1, transform=_common_transform),
        ],
    ),
    val=dict(
        _delete_=True,
        type="S3DISDataset",
        split="Area_5",
        data_root="data/s3dis",
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train",
                 return_grid_coord=True),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"),
                 feat_keys=("color", "normal")),
        ],
    ),
)
