_base_ = ["./keypoint_ptv3.py"]
# Global keypoint head on OctFormer (parity: reference keypoint_octformer.py)

model = dict(
    _delete_=True,
    type="KeypointOctFormer",
    num_keypoints=6,
    hidden_dim=256,
    backbone_conf=dict(
        type="OctFormer-v1m1",
        in_channels=4,
        channels=(96, 192, 384, 384),
        num_blocks=(2, 2, 6, 2),
        num_heads=(6, 12, 24, 24),
        patch_size=32,
        dilation=4,
    ),
)
