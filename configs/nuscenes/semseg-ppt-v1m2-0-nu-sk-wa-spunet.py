_base_ = ["../semantic_kitti/semseg-ppt-v1m2-0-sk-nu-wa-spunet.py"]
# Decoupled-head PPT outdoor trio, validated on nuScenes (reference
# configs/nuscenes/semseg-ppt-v1m2-0-nu-sk-wa-spunet.py)

data = dict(
    num_classes=16,
    val=dict(
        _delete_=True,
        type="NuScenesDataset",
        split="val",
        data_root="data/nuscenes",
        transform=[
            dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
                 return_grid_coord=True),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"),
                 feat_keys=("coord", "strength")),
        ],
    ),
)
