_base_ = ["./semseg-ppt-v1m2-0-sk-nu-wa-spunet.py"]
# SemanticKITTI submission from the jointly-trained PPT model (reference
# configs/semantic_kitti/semseg-ppt-v1m2-0-sk-nu-wa-spunet-submit.py)

save_submit = True
data = dict(
    test=dict(
        type="SemanticKITTIDataset",
        split="test",
        data_root="data/semantic_kitti",
        test_mode=True,
        transform=[
            dict(type="Copy", keys_dict=dict(segment="origin_segment")),
            dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
                 return_inverse=True, return_grid_coord=True),
        ],
        test_cfg=dict(
            voxelize=dict(type="GridSample", grid_size=0.05, hash_type="fnv",
                          mode="test", return_grid_coord=True),
            crop=None,
            post_transform=[
                dict(type="Collect", keys=("coord", "grid_coord", "index"),
                     feat_keys=("coord", "strength")),
            ],
            aug_transform=[[dict(type="RandomScale", scale=[1.0, 1.0])]],
        ),
    ),
)
