_base_ = ["./keypoint_ptv3.py"]
# Global keypoint head on OA-CNNs (parity: reference keypoint_oa_cnns.py)

model = dict(
    _delete_=True,
    type="KeypointOACNNs",
    num_keypoints=6,
    hidden_dim=256,
    backbone_conf=dict(
        type="OA-CNNs",
        in_channels=4,
        base_channels=32,
        channels=(32, 64, 128, 128),
        layers=(2, 2, 2, 2),
    ),
)
