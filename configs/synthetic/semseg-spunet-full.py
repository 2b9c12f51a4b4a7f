_base_ = ["./semseg-spunet-mini.py"]
# Convergence-scale synthetic semseg run (VERDICT r1 item 2): recorded in
# PARITY.md with seed; same engine path as the ScanNet configs.

batch_size = 4
slot_size = 8192
eval_epoch = 20
seed = 123
num_worker = 2

model = dict(
    backbone=dict(
        base_channels=24,
        channels=(24, 48, 64, 96, 96, 64, 48, 48),
        layers=(2, 2, 2, 2, 2, 2, 2, 2),
    ),
)

data = dict(
    train=dict(num_scenes=24, num_points=16000, loop=2),
    val=dict(num_scenes=6, num_points=16000),
)
