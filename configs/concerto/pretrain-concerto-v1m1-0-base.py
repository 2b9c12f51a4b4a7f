_base_ = ["../synthetic/concerto-mini.py"]
# Concerto joint 2D-3D SSL pretraining at full size (parity: reference
# configs/concerto/* — SpUNet student/teacher, multi-crop views, frozen-ViT
# patch distillation over ScanNet image-point correspondences produced by the
# concerto preprocessing)

data_root = "data/scannet_image_point"
batch_size = 8
slot_size = 65536
eval_epoch = 100

patch_h = 16
patch_w = 16
patch_size = 14

model = dict(
    backbone=dict(
        _delete_=True,
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=0,
        base_channels=32,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
    ),
    head_hidden_channels=2048,
    head_embed_channels=256,
    head_num_prototypes=4096,
    enc2d_embed_channels=384,
    enc2d_depth=6,
    enc2d_num_heads=6,
    patch_size=patch_size,
    patch_h=patch_h,
    patch_w=patch_w,
    num_matches=4096,
)

optimizer = dict(_delete_=True, type="AdamW", lr=0.004, weight_decay=0.05)
scheduler = dict(
    _delete_=True,
    type="OneCycleLR",
    pct_start=0.05,
    div_factor=10.0,
    final_div_factor=1000.0,
)
