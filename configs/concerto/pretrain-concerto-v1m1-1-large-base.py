_base_ = ["./pretrain-concerto-v1m1-0-base.py"]
# Concerto large: PTv3-large enc-mode backbone (reference
# configs/concerto/pretrain-concerto-v1m1-1-large-base.py)

model = dict(
    backbone=dict(
        _delete_=True,
        type="PT-v3m2",
        in_channels=6,
        enc_mode=True,
        stride=(2, 2, 2, 2),
        enc_depths=(3, 3, 3, 12, 3),
        enc_channels=(48, 96, 192, 384, 512),
        enc_num_head=(3, 6, 12, 24, 32),
        enc_patch_size=(128, 128, 128, 128, 128),
        drop_path=0.3,
        slot_divisors=(1, 4, 16, 32, 64),
    ),
)
