_base_ = ["./keypoint_ptv3.py"]
# Global keypoint head on SpUNet (parity: reference keypoint_sparse_unet.py)

model = dict(
    _delete_=True,
    type="KeypointSparseUNet",
    num_keypoints=6,
    hidden_dim=256,
    backbone_conf=dict(
        type="SpUNet-v1m1",
        in_channels=4,
        num_classes=0,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
    ),
)
