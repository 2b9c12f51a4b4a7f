_base_ = ["./keypoint_ptv3.py"]
# Global keypoint head on Swin3D (parity: reference keypoint_swin3d.py,
# incl. its coord_feat stem fixup — here the backbone takes coord+feat
# channels directly)

model = dict(
    _delete_=True,
    type="KeypointSwin3D",
    num_keypoints=6,
    hidden_dim=256,
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
