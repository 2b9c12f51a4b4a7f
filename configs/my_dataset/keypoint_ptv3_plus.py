_base_ = ["./keypoint_ptv3.py"]
# KeypointPTv3Plus: PTv3 with bottleneck large-kernel xCPE (parity: reference
# keypoint_ptv3_plus.py — 1x1 down -> k^3 SubMConv -> 1x1 up at every block)

model = dict(
    type="KeypointPTv3Plus",
    backbone_conf=dict(
        type="PT-v3plus",
        cpe_kernel_size=5,
        cpe_bottleneck=16,
    ),
)
