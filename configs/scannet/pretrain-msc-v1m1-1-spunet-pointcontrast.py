_base_ = ["./pretrain-msc-v1m1-0-spunet-base.py"]
# PointContrast-style pretraining on ScanNet frame pairs (reference
# configs/scannet/pretrain-msc-v1m1-1-spunet-pointcontrast.py): the two views
# are real RGB-D partial frames with known overlap instead of synthetic
# augmentations of one scene.

# pair frames carry color only (no normals): 3-channel views
model = dict(
    backbone=dict(in_channels=3),
    backbone_in_channels=3,
)

data = dict(
    train=dict(
        _delete_=True,
        type="ScanNetPairDataset",
        split="train",
        data_root="data/scannet_pair",
        overlap_threshold=0.3,
        transform=[],
        view1_transform=[
            dict(type="RandomRotate", angle=[-1, 1], axis="z", p=0.5),
            dict(type="RandomJitter", sigma=0.005, clip=0.02),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train", return_grid_coord=True),
            dict(type="SphereCrop", point_max=65536, mode="random"),
        ],
        view2_transform=[
            dict(type="RandomRotate", angle=[-1, 1], axis="z", p=0.5),
            dict(type="RandomJitter", sigma=0.005, clip=0.02),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train", return_grid_coord=True),
            dict(type="SphereCrop", point_max=65536, mode="random"),
        ],
    ),
)
