_base_ = ["../_base_/default_runtime.py"]
# Synthetic instance segmentation: PointGroup on the blob-room scenes (each
# blob = one instance).  Trains to a recorded mAP (PARITY.md); same engine
# path as configs/scannet/insseg-pointgroup-*.

num_classes = 6
segment_ignore_index = (-1, 0, 1)
batch_size = 4
slot_size = 4096
eval_epoch = 12
seed = 7
num_worker = 2

model = dict(
    type="PG-v1m1",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=0,
        base_channels=16,
        channels=(16, 32, 48, 64, 64, 48, 32, 32),
        layers=(1, 1, 1, 1, 1, 1, 1, 1),
        stem_kernel=3,
        bn_momentum=0.1,
    ),
    backbone_out_channels=32,
    semantic_num_classes=num_classes,
    segment_ignore_index=segment_ignore_index,
    cluster_thresh=0.08,
)

optimizer = dict(type="AdamW", lr=3e-3, weight_decay=1e-4)
scheduler = dict(type="PolyLR", power=0.9)

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="InsSegEvaluator", segment_ignore_index=segment_ignore_index,
         cluster_thresh=0.08, min_points=50),
    dict(type="CheckpointSaver"),
]

_pipeline = [
    dict(type="CenterShift", apply_z=True),
    dict(type="GridSample", grid_size=0.05, mode="train", return_grid_coord=True),
    dict(type="NormalizeColor"),
    dict(type="InstanceParser", segment_ignore_index=segment_ignore_index),
    dict(type="Collect",
         keys=("coord", "grid_coord", "segment", "instance", "instance_centroid"),
         feat_keys=("coord", "color")),
]

data = dict(
    num_classes=num_classes,
    ignore_index=-1,
    train=dict(
        type="SyntheticSemSegDataset",
        split="train",
        num_scenes=12,
        num_points=8000,
        num_classes=num_classes,
        loop=2,
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="RandomRotate", angle=[-1, 1], axis="z", p=0.5),
            dict(type="RandomFlip", p=0.5),
            dict(type="GridSample", grid_size=0.05, mode="train", return_grid_coord=True),
            dict(type="NormalizeColor"),
            dict(type="InstanceParser", segment_ignore_index=segment_ignore_index),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "segment", "instance", "instance_centroid"),
                 feat_keys=("coord", "color")),
        ],
    ),
    val=dict(
        type="SyntheticSemSegDataset",
        split="val",
        num_scenes=4,
        num_points=8000,
        num_classes=num_classes,
        transform=_pipeline,
    ),
)
