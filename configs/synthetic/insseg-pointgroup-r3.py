_base_ = ["./insseg-pointgroup-mini.py"]
# Round-3 trained-AP run (VERDICT r2 item 5).  The mini run (12 scenes x 12
# epochs = 72 steps) learned the mechanics (bias cosine 0.89 vs GT) but
# confused the height-band classes -> mAP 0; this is the convergence-scale
# version.

eval_epoch = 48

test = dict(
    type="InsSegTester",
    segment_ignore_index=(-1, 0, 1),
    cluster_thresh=0.08,
    cluster_min_points=50,
    capacity=4096,
)
seed = 7

data = dict(
    train=dict(num_scenes=48, num_points=8000, loop=1),
    val=dict(num_scenes=6, num_points=8000),
    # non-oracle InsSegTester run (VERDICT r2 weak item 6):
    #   python tools/test.py --config-file configs/synthetic/insseg-pointgroup-r3.py \
    #       --options save_path=exp/insseg_r3
    test=dict(
        type="SyntheticSemSegDataset",
        split="val",
        num_scenes=6,
        num_points=8000,
        num_classes=6,
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="GridSample", grid_size=0.05, mode="train", return_grid_coord=True),
            dict(type="NormalizeColor"),
            dict(type="InstanceParser", segment_ignore_index=(-1, 0, 1)),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "segment", "instance", "instance_centroid"),
                 feat_keys=("coord", "color")),
        ],
    ),
)
