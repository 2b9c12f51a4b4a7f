_base_ = ["../scannet/semseg-spunet-v1m1-0-base.py"]
# SpUNet semseg on S3DIS Area-5 (recipe parity: reference
# configs/s3dis/semseg-spunet-v1m1-0-base.py; use tools/test_s3dis_6fold.py
# to aggregate per-area confusion counts for the 6-fold metric)

num_classes = 13

model = dict(
    backbone=dict(num_classes=13),
)

data = dict(
    num_classes=13,
    train=dict(
        type="S3DISDataset",
        split=("Area_1", "Area_2", "Area_3", "Area_4", "Area_6"),
        data_root="data/s3dis",
    ),
    val=dict(type="S3DISDataset", split="Area_5", data_root="data/s3dis"),
    test=dict(type="S3DISDataset", split="Area_5", data_root="data/s3dis"),
)
