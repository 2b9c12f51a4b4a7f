_base_ = ["./keypoint_ptv3.py"]
# Hough-voting keypoint head on Swin3D (parity: reference
# keypoint_swin3d_plus.py KeypointSwin3DVote — per-point votes, smooth-L1
# restricted to points within vote_radius of the GT keypoint)

model = dict(
    _delete_=True,
    type="KeypointSwin3DVote",
    num_keypoints=6,
    hidden_dim=256,
    vote_radius=0.3,  # normalized units
    backbone_conf=dict(
        type="Swin3D-v1m1",
        in_channels=4,
        depths=(2, 2, 6, 2),
        channels=(48, 96, 192, 384),
        num_heads=(3, 6, 12, 24),
        window_sizes=(4, 4, 4, 4),
        drop_path_rate=0.3,
    ),
)
