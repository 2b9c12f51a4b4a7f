_base_ = ["./offset_keypoint_ptv3.py"]
# Dense offset+mask keypoint head on Swin3D (parity: reference
# configs/my_dataset/offset_keypoint_swin3d.py)

model = dict(
    _delete_=True,
    type="OffsetKeypointSwin3D",
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
