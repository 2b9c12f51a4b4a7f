# Drift-scale back-end experiment (VERDICT r2 item 4): 520-frame synthetic
# stadium circuit (tools/make_synthetic_kitti.py --loop) with oncoming cars.
# Odometry-only baseline; synth_loop_full.py adds keyframes + loop closure +
# pose graph.  GT-label dynamic filtering = the reference's upper-bound
# experiment (`SemanticFAST-LIO2-prediction/fusion_gt_clean_bag.py`).
#
#   python tools/make_synthetic_kitti.py --out /tmp/synth_loop --frames 520 --loop
#   python tools/run_slam.py --config-file configs/slam/synth_loop.py
#   # no-filter ablation: --options semantic.enabled=False

data_root = "/tmp/synth_loop"
sequence = "00"
max_frames = None

semantic = dict(
    enabled=True,
    labels_from="files",  # GT labels (upper bound); raw id 10 = car
    dynamic_classes=(0,),  # train-id 0 = car (see semantic_kitti learning map)
)

odometry = dict(
    scan_capacity=16384,
    map_capacity=262144,
    scan_voxel=0.5,
    map_voxel=0.4,
    icp_iters=8,
    knn_k=5,
    max_corr_dist=1.0,
    huber_delta=0.3,
    min_planarity=0.6,
    map_radius=120.0,
    min_range=2.5,
    max_range=80.0,
)

save_path = "exp/slam/synth_loop"
