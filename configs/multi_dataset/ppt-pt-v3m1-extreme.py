_base_ = ["./ppt-spunet-joint.py"]
# PPT "extreme" joint training with PTv3 + backbone-internal PDNorm (recipe
# parity: reference configs/scannet/semseg-pt-v3m1-1-ppt-extreme.py)

model = dict(
    backbone=dict(
        _delete_=True,
        type="PT-v3m1",
        in_channels=6 + 32,  # features + condition context
        stride=(2, 2, 2, 2),
        enc_depths=(2, 2, 2, 6, 2),
        enc_channels=(32, 64, 128, 256, 512),
        enc_num_head=(2, 4, 8, 16, 32),
        enc_patch_size=(128, 128, 128, 128, 128),
        dec_depths=(2, 2, 2, 2),
        dec_channels=(64, 64, 128, 256),
        dec_num_head=(4, 4, 8, 16),
        dec_patch_size=(128, 128, 128, 128),
        drop_path=0.3,
        slot_divisors=(1, 4, 16, 32, 64),
        pdnorm_conditions=2,  # backbone-internal PDNorm (ScanNet, S3DIS)
    ),
    backbone_out_channels=64,
)

amp = "bf16"
optimizer = dict(_delete_=True, type="AdamW", lr=0.005, weight_decay=0.05)
scheduler = dict(
    _delete_=True,
    type="OneCycleLR",
    pct_start=0.05,
    div_factor=10.0,
    final_div_factor=1000.0,
)
