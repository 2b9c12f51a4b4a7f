_base_ = ["./offset-keypoint-mini.py"]
# Convergence-scale synthetic offset-keypoint run (VERDICT r1 item 2: train
# to a recorded metric).  Same task semantics as the pig benchmark
# (configs/my_dataset/offset_keypoint_ptv3.py — mm units, R=300mm online
# targets, argmax reconstruction metric); data is the procedural pig
# generator at realistic density.  Result recorded in PARITY.md.

batch_size = 4
slot_size = 4096
eval_epoch = 32
seed = 42
num_worker = 2

model = dict(
    # real pig clouds are N x 7 (xyz + normal + curvature,
    # `keypoint_dataset.py:114-143`): coords in the features break the
    # ellipsoid's mirror symmetry that normals alone cannot
    backbone_conf=dict(
        in_channels=7,
        enc_channels=(32, 64, 128),
        enc_num_head=(2, 4, 8),
        dec_channels=(32, 64),
        dec_num_head=(2, 4),
        slot_divisors=(1, 2, 4),
    ),
    hidden_dim=128,
)

optimizer = dict(lr=1.5e-3)

# R=120mm: the synthetic pig's +-y keypoints are ~440mm apart, so the pig
# benchmark's R=300mm would overlap their masks and make the argmax
# reconstruction ambiguous (real pigs are larger)
data = dict(
    train=dict(num_scenes=32, num_points=6000, loop=2, offset_radius=120.0),
    val=dict(num_scenes=8, num_points=6000, offset_radius=120.0),
)

data_train_transform = [
    dict(type="GridSample", grid_size=0.02, mode="train", return_grid_coord=True),
    dict(type="ShufflePoint"),
    dict(type="Collect",
         keys=("coord", "grid_coord", "keypoint_offset", "keypoint_mask", "scale", "centroid"),
         feat_keys=("coord", "feat")),
]
data["train"]["transform"] = data_train_transform
data["val"]["transform"] = [
    dict(type="GridSample", grid_size=0.02, mode="train", return_grid_coord=True),
    dict(type="Collect",
         keys=("coord", "grid_coord", "keypoint_offset", "keypoint_mask", "scale", "centroid"),
         feat_keys=("coord", "feat")),
]
