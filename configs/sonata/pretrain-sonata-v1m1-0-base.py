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
    head_hidden=4096,
    student_temp=0.1,
    mask_jitter=0.01,
    num_matches=2048,
    num_local_view=4,
    mask_loss_weight=2 / 8,
    roll_mask_loss_weight=2 / 8,
    unmask_loss_weight=4 / 8,
)

# teacher EMA: cosine momentum 0.996 -> 1.0 over training (reference
# `sonata_v1m1_base.py:222-227`); heads EMA alongside the backbone
ema = dict(
    momentum=dict(base=0.996, final=1.0),
    pairs=[
        ["student_backbone", "teacher_backbone"],
        ["student_mask_head", "teacher_mask_head"],
        ["student_unmask_head", "teacher_unmask_head"],
    ],
)

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    # scheduled mask size/ratio + teacher temperature (reference
    # CosineSchedulers, `sonata_v1m1_base.py:188-247`)
    dict(type="SonataScheduler"),
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
