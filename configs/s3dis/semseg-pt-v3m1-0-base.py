_base_ = ["../scannet/semseg-pt-v3m1-0-base.py"]
# PTv3 semseg on S3DIS Area-5 (recipe parity: reference
# configs/s3dis/semseg-pt-v3m1-1-rpe.py / base — 13 classes, Area_5 holdout)

num_classes = 13

model = dict(
    num_classes=13,
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
