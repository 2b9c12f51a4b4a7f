_base_ = ["./keypoint_ptv3.py"]
# Global keypoint head on PTv2 (parity: reference keypoint_ptv2.py)

model = dict(
    _delete_=True,
    type="KeypointPTv2",
    num_keypoints=6,
    hidden_dim=256,
    backbone_conf=dict(
        type="PT-v2m2",
        in_channels=4,
        enc_depths=(2, 2, 6, 2),
        enc_channels=(96, 192, 384, 512),
        enc_groups=(12, 24, 48, 64),
        enc_neighbours=(16, 16, 16, 16),
        dec_depths=(1, 1, 1, 1),
        dec_channels=(48, 96, 192, 384),
        dec_groups=(6, 12, 24, 48),
        dec_neighbours=(16, 16, 16, 16),
        grid_sizes=(0.04, 0.08, 0.16, 0.32),
    ),
)
