_base_ = ["../multi_dataset/ppt-spunet-joint.py"]
# PPT language-guided joint training ScanNet + Structured3D (reference
# configs/scannet/semseg-ppt-v1m1-0-sc-st-spunet.py)

model = dict(
    _delete_=True,
    type="PPT-v1m1",
    conditions=("ScanNet", "Structured3D"),
    num_classes=(20, 25),
    context_channels=256,
    backbone_out_channels=96,
    embed_dim=512,
    # language-guided head: CLIP text embeddings of the joint vocabulary
    # (reference `semseg-ppt-v1m1-0-sc-st-spunet.py:41-52`); export the
    # frozen table offline with tools/export_clip_class_embeddings.py
    # --config <this file> and point class_embedding_path at the .npy
    template="[x]",
    # fmt: off
    class_name=(
        "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
        "window", "bookshelf", "bookcase", "picture", "counter", "desk", "shelves", "curtain",
        "dresser", "pillow", "mirror", "ceiling", "refrigerator", "television", "shower curtain", "nightstand",
        "toilet", "sink", "lamp", "bathtub", "garbagebin", "board", "beam", "column",
        "clutter", "otherstructure", "otherfurniture", "otherprop",
    ),
    valid_index=(
        (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 11, 12, 13, 15, 20, 22, 24, 25, 27, 34),
        (0, 1, 2, 3, 4, 5, 6, 7, 8, 11, 13, 14, 15, 16, 17, 18, 19, 20, 21, 23, 25, 26, 33, 34, 35),
    ),
    # fmt: on
    backbone=dict(
        type="SpUNet-v1m3",
        in_channels=6,
        num_classes=0,
        base_channels=32,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        pdnorm_conditions=2,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
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
    train=dict(
        datasets=[
            dict(
                type="ScanNetDataset",
                split="train",
                data_root="data/scannet",
                condition=0,
                loop=1,
                transform=_common_transform,
            ),
            dict(
                type="Structured3DDataset",
                split=("train", "test"),
                data_root="data/structured3d",
                condition=1,
                loop=1,
                transform=_common_transform,
            ),
        ],
    ),
)
