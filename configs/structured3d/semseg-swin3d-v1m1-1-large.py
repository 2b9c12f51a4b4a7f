_base_ = ["./semseg-swin3d-v1m1-0-small.py"]
# Swin3D-L on Structured3D (reference
# configs/structured3d/semseg-swin3d-v1m1-1-large.py)

model = dict(
    backbone_out_channels=80,
    backbone=dict(
        depths=(2, 4, 9, 4),
        channels=(80, 160, 320, 640),
        num_heads=(5, 10, 20, 40),
    ),
)
