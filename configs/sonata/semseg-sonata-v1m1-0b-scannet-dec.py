_base_ = ["./semseg-sonata-v1m1-0a-scannet-lin.py"]
# Decoder probe (reference configs/sonata/semseg-sonata-v1m1-0b-scannet-dec.py):
# frozen pretrained encoder + a trainable light decoder and head.

model = dict(
    backbone=dict(
        enc_mode=False,
        upcast_level=0,
        dec_depths=(2, 2, 2, 2),
        dec_channels=(64, 64, 128, 256),
        dec_num_head=(4, 4, 8, 16),
        dec_patch_size=(128, 128, 128, 128),
    ),
    backbone_out_channels=64,
)
optimizer = dict(freeze_all_except=("dec", "seg_head"))
