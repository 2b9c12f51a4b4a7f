_base_ = ["./keypoint_ptv3.py"]
# Global keypoint head on StratifiedTransformer (parity: reference
# keypoint_stratified_transformer.py)

model = dict(
    _delete_=True,
    type="KeypointStratifiedTransformer",
    num_keypoints=6,
    hidden_dim=256,
    backbone_conf=dict(
        type="ST-v1m2",
        in_channels=4,
        channels=(48, 96, 192, 384),
        depths=(2, 2, 6, 2),
        num_heads=(3, 6, 12, 24),
        patch_size=32,
        super_ratio=4,
    ),
)
