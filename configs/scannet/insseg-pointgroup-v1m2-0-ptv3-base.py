_base_ = ["./insseg-pointgroup-v1m1-0-spunet-base.py"]
# PointGroup with a PTv3 backbone (reference
# configs/scannet/insseg-pointgroup-v1m2-0-ptv3-base.py)

model = dict(
    type="PG-v1m2",
    backbone=dict(
        _delete_=True,
        type="PT-v3m1",
        in_channels=6,
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        stride=(2, 2, 2, 2),
        enc_depths=(2, 2, 2, 6, 2),
        enc_channels=(32, 64, 128, 256, 512),
        enc_num_head=(2, 4, 8, 16, 32),
        enc_patch_size=(128, 128, 128, 128, 128),
        dec_depths=(2, 2, 2, 2),
        dec_channels=(64, 64, 128, 256),
        dec_num_head=(4, 4, 8, 16),
        dec_patch_size=(128, 128, 128, 128),
        mlp_ratio=4,
        qkv_bias=True,
        drop_path=0.3,
        shuffle_orders=True,
        slot_divisors=(1, 4, 16, 32, 64),
    ),
    backbone_out_channels=64,
)

amp = "bf16"
optimizer = dict(_delete_=True, type="AdamW", lr=0.006, weight_decay=0.05)
scheduler = dict(
    _delete_=True,
    type="OneCycleLR",
    pct_start=0.05,
    div_factor=10.0,
    final_div_factor=1000.0,
)
param_dicts = [dict(keyword="blocks", lr=0.0006)]
