_base_ = ["./semseg-spunet-v1m1-0-base.py"]
# SpUNet on S3DIS with color+normal features (reference
# configs/s3dis/semseg-spunet-v1m1-0-cn-base.py — S3DIS preprocessing with
# normals enabled; in_channels stays 6 = color+normal replaced by coord+color
# plus normal concat)

model = dict(backbone=dict(in_channels=6))
