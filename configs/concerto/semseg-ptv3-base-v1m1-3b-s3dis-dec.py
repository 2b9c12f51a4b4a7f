_base_ = ["../sonata/semseg-sonata-v1m1-0b-scannet-dec.py"]
# Concerto-base dec probe on s3dis (reference configs/concerto/semseg-ptv3-base-v1m1-3b-s3dis-dec.py)

num_classes = 13
weight = "exp/concerto/pretrain/model/model_best.ckpt"
model = dict(num_classes=13)
data = dict(
    num_classes=13,
    train=dict(
        _delete_=True,
        type="S3DISDataset",
        split=("Area_1", "Area_2", "Area_3", "Area_4", "Area_6"),
        data_root="data/s3dis",
    ),
    val=dict(_delete_=True, type="S3DISDataset", split="Area_5", data_root="data/s3dis"),
    test=dict(_delete_=True, type="S3DISDataset", split="Area_5", data_root="data/s3dis"),
)
