_base_ = ["../_base_/default_runtime.py"]
# BASELINE config #1: SpUNet semseg on ScanNet (mirrors reference
# configs/scannet/semseg-spunet-v1m1-0-base.py recipe, TPU-sized batches)

num_classes = 20
batch_size = 8
slot_size = 131072  # ~102k-point ScanNet scenes after 0.02 grid
mix_prob = 0.8
eval_epoch = 100
clip_grad = None

model = dict(
    type="DefaultSegmentor",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=num_classes,
        base_channels=32,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

optimizer = dict(type="SGD", lr=0.05, momentum=0.9, weight_decay=1e-4, nesterov=True)
scheduler = dict(type="OneCycleLR", pct_start=0.05, div_factor=10.0, final_div_factor=10000.0)

data = dict(
    num_classes=num_classes,
    ignore_index=-1,
    names=None,  # ScanNetDataset.class_names
    train=dict(
        type="ScanNetDataset",
        split="train",
        data_root="data/scannet",
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
            dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train", return_grid_coord=True),
            dict(type="SphereCrop", point_max=100000, mode="random"),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="ShufflePoint"),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("color", "normal")),
        ],
    ),
    val=dict(
        type="ScanNetDataset",
        split="val",
        data_root="data/scannet",
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train", return_grid_coord=True),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("color", "normal")),
        ],
    ),
    test=dict(
        type="ScanNetDataset",
        split="val",
        data_root="data/scannet",
        test_mode=True,
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="NormalizeColor"),
            dict(type="Copy", keys_dict=dict(segment="origin_segment")),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train",
                 return_inverse=True, return_grid_coord=True),
        ],
        test_cfg=dict(
            voxelize=dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="test",
                          return_grid_coord=True),
            crop=None,
            post_transform=[
                dict(type="CenterShift", apply_z=False),
                dict(type="Collect", keys=("coord", "grid_coord", "index"), feat_keys=("color", "normal")),
            ],
            aug_transform=[[dict(type="RandomScale", scale=[0.9, 0.9])],
                           [dict(type="RandomScale", scale=[1.0, 1.0])],
                           [dict(type="RandomScale", scale=[1.1, 1.1])]],
        ),
    ),
)
