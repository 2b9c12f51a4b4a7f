_base_ = ["../_base_/default_runtime.py"]
# MaskedSceneContrast SSL pretraining on ScanNet (recipe parity: reference
# configs/scannet/pretrain-msc-v1m1-0-spunet-base.py)

batch_size = 8
slot_size = 65536
eval_epoch = 100
evaluate = False

model = dict(
    type="MSC-v1m1",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=0,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
    ),
    backbone_in_channels=6,
    backbone_out_channels=96,
    nce_t=0.4,
    contrast_weight=1.0,
    reconstruct_weight=1.0,
    reconstruct_color=True,
    mask_rate=0.4,
    num_matches=4096,
)

optimizer = dict(type="SGD", lr=0.1, momentum=0.8, weight_decay=1e-4, nesterov=True)
scheduler = dict(type="OneCycleLR", pct_start=0.05, div_factor=10.0, final_div_factor=10000.0)

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="CheckpointSaver"),
]

data = dict(
    train=dict(
        type="ScanNetDataset",
        split="train",
        data_root="data/scannet",
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="RandomScale", scale=[0.9, 1.1]),
            dict(type="RandomFlip", p=0.5),
            dict(type="RandomJitter", sigma=0.005, clip=0.02),
            dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
            dict(type="ChromaticTranslation", p=0.95, ratio=0.05),
            dict(type="ChromaticJitter", p=0.95, std=0.05),
            dict(type="SphereCrop", point_max=100000, mode="random"),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            # emits view{1,2}_{coord,color,normal,grid_coord,origin}; the MSC
            # model consumes views directly (no Collect needed)
            dict(type="ContrastiveViewsGenerator",
                 view_keys=("coord", "color", "normal"),
                 view_trans_cfg=[
                     dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.75),
                     dict(type="RandomScale", scale=[0.9, 1.1]),
                     dict(type="RandomFlip", p=0.5),
                     dict(type="RandomJitter", sigma=0.005, clip=0.02),
                     dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train",
                          return_grid_coord=True),
                 ]),
        ],
    ),
)
