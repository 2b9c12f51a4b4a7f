_base_ = ["./semseg-ppt-v1m1-0-sc-st-spunet.py"]
# ScanNet benchmark submission from the PPT joint model (reference
# configs/scannet/semseg-ppt-v1m1-1-sc-st-spunet-submit.py)

save_submit = True
data = dict(
    test=dict(
        type="ScanNetDataset",
        split="test",
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
            voxelize=dict(type="GridSample", grid_size=0.02, hash_type="fnv",
                          mode="test", return_grid_coord=True),
            crop=None,
            post_transform=[
                dict(type="CenterShift", apply_z=False),
                dict(type="Collect", keys=("coord", "grid_coord", "index"),
                     feat_keys=("color", "normal")),
            ],
            aug_transform=[[dict(type="RandomScale", scale=[1.0, 1.0])]],
        ),
    ),
)
