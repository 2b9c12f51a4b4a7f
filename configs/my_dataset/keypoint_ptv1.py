_base_ = ["./keypoint_ptv3.py"]
# Global keypoint head on PTv1 (parity: reference keypoint_ptv1.py)

model = dict(
    _delete_=True,
    type="KeypointPTv1",
    num_keypoints=6,
    hidden_dim=256,
    backbone_conf=dict(
        type="PT-v1",
        in_channels=4,
        planes=(32, 64, 128, 256, 512),
        blocks=(2, 3, 4, 6, 3),
        strides=(1, 4, 4, 4, 4),
        nsample=(8, 16, 16, 16, 16),
    ),
)
