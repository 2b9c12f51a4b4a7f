_base_ = ["../scannet/semseg-pt-v1-0-base.py"]
# PTv1 on S3DIS Area-5 (reference configs/s3dis/semseg-pt-v1-0-base.py)

num_classes = 13
model = dict(num_classes=13)
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
