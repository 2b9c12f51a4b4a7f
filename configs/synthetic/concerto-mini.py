_base_ = ["../_base_/default_runtime.py"]
# mini Concerto (2D-3D SSL) smoke config — synthetic ImagePointDataset on disk.
# Generate data with: python tools/make_synthetic_image_point.py --out <root>
# then: python tools/train.py --config-file configs/synthetic/concerto-mini.py \
#          --options data_root=<root> save_path=<exp>

data_root = "data/synthetic_image_point"
batch_size = 2
slot_size = 512  # == global_slot of MultiViewGenerator
eval_epoch = 2
evaluate = False
empty_cache = False

patch_h = 4
patch_w = 4
patch_size = 8

model = dict(
    type="Concerto-v1m1",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=0,
        base_channels=16,
        channels=(16, 16, 32, 32, 32, 32, 16, 16),
        layers=(1,) * 8,
        stem_kernel=3,
    ),
    backbone_in_channels=6,
    num_global_view=2,
    num_local_view=2,
    head_hidden_channels=64,
    head_embed_channels=32,
    head_num_prototypes=64,
    enc2d_embed_channels=32,
    enc2d_depth=1,
    enc2d_num_heads=2,
    patch_size=patch_size,
    patch_h=patch_h,
    patch_w=patch_w,
    num_matches=256,
)

# teacher EMA inside the jitted train step (reference after_step foreach EMA,
# concerto_v1m1_base.py:397-429)
ema = dict(
    momentum=0.99,
    pairs=[
        ("student_backbone", "teacher_backbone"),
        ("student_mask_head", "teacher_mask_head"),
        ("student_unmask_head", "teacher_unmask_head"),
    ],
)

optimizer = dict(type="AdamW", lr=1e-3, weight_decay=0.01)
scheduler = dict(type="CosineAnnealingLR", eta_min=1e-5)

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="CheckpointSaver"),
]

view_trans = [
    dict(type="GridSample", grid_size=0.04, mode="train", return_grid_coord=True),
]

data = dict(
    num_classes=0,
    train=dict(
        type="ImagePointDataset",
        data_root=data_root,
        split="train",
        crop_h=patch_h * patch_size,
        crop_w=patch_w * patch_size,
        patch_size=patch_size,
        max_images=4,
        loop=2,
        transform=[
            dict(type="NormalizeColor"),
            dict(
                type="MultiViewGenerator",
                global_view_num=2,
                local_view_num=2,
                view_keys=("coord", "color", "normal"),
                global_transform=view_trans,
                local_transform=view_trans,
                global_slot=512,
                local_slot=128,
            ),
        ],
    ),
)
