_base_ = ["../scannet/pretrain-msc-v1m1-0-spunet-base.py"]
# Sonata self-distillation SSL pretraining (recipe parity: reference
# configs/sonata/*: PTv3 enc-mode student/teacher, Sinkhorn prototypes,
# EMA teacher via the model-as-hook mechanism)

model = dict(
    _delete_=True,
    type="Sonata-v1m1",
    backbone=dict(
        type="PT-v3m1",
        in_channels=6,
        enc_mode=True,
        stride=(2, 2, 2, 2),
        enc_depths=(2, 2, 2, 6, 2),
        enc_channels=(32, 64, 128, 256, 512),
        enc_num_head=(2, 4, 8, 16, 32),
        enc_patch_size=(128, 128, 128, 128, 128),
        drop_path=0.3,
        slot_divisors=(1, 4, 16, 32, 64),
    ),
    backbone_in_channels=6,
    num_prototypes=4096,
    proj_dim=256,
    student_temp=0.1,
    teacher_temp=0.05,
    mask_rate=0.5,
    num_matches=2048,
)

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="ModelHook"),  # fires the EMA teacher update after each step
    dict(type="CheckpointSaver"),
]

amp = "bf16"
optimizer = dict(_delete_=True, type="AdamW", lr=0.004, weight_decay=0.05)
scheduler = dict(
    _delete_=True,
    type="OneCycleLR",
    pct_start=0.05,
    div_factor=10.0,
    final_div_factor=1000.0,
)
