_base_ = ["../sonata/semseg-sonata-v1m1-0a-scannet-lin.py"]
# Concerto linear probe on SemanticKITTI (reference
# configs/concerto/semseg-ptv3-large-v1m1-kitti-4a-lin.py)

num_classes = 19
weight = "exp/concerto/pretrain/model/model_best.ckpt"
model = dict(
    num_classes=19,
    backbone=dict(in_channels=4),
)
data = dict(
    _delete_=True,
    num_classes=19,
    ignore_index=-1,
    train=dict(
        type="SemanticKITTIDataset",
        split="train",
        data_root="data/semantic_kitti",
        transform=[
            dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
            dict(type="RandomScale", scale=[0.9, 1.1]),
            dict(type="RandomFlip", p=0.5),
            dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
                 return_grid_coord=True),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"),
                 feat_keys=("coord", "strength")),
        ],
    ),
    val=dict(
        type="SemanticKITTIDataset",
        split="val",
        data_root="data/semantic_kitti",
        transform=[
            dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
                 return_grid_coord=True),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"),
                 feat_keys=("coord", "strength")),
        ],
    ),
)
