_base_ = ["./semseg-sonata-v1m1-0b-scannet-dec.py"]
# Sonata dec probe on s3dis (reference configs/sonata/semseg-sonata-v1m1-3b-s3dis-dec.py)

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
