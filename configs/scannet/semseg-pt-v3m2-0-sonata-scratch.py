_base_ = ["./semseg-pt-v3m1-0-base.py"]
# Sonata-flavoured PTv3 (PT-v3m2: encoder-mode + upcast) trained from scratch
# for semseg (reference configs/scannet/semseg-pt-v3m2-0-sonata-scratch.py).

model = dict(
    backbone=dict(
        type="PT-v3m2",
        enc_mode=True,
        upcast_level=4,  # concat all pooled levels back at full resolution
    ),
    backbone_out_channels=32 + 64 + 128 + 256 + 512,
)
