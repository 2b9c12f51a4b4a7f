_base_ = ["../semantic_kitti/semseg-ptv3-base.py"]
# PTv3 semseg on Waymo Open (recipe parity: reference
# configs/waymo/semseg-pt-v3m1-0-base.py — 22 classes;
# tools/create_waymo_semseg_submission-style export via the tester writers)

num_classes = 22

model = dict(
    backbone=dict(in_channels=4),
)

data = dict(
    num_classes=22,
    train=dict(type="WaymoDataset", data_root="data/waymo", split="training"),
    val=dict(type="WaymoDataset", data_root="data/waymo", split="validation"),
)
