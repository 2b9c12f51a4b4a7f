_base_ = ["./offset_keypoint_ptv3.py"]
# Dense offset+mask keypoint head on OctFormer (parity: reference
# configs/my_dataset/offset_keypoint_octformer.py)

model = dict(
    _delete_=True,
    type="OffsetKeypointOctFormer",
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
