# BASELINE config #4: full single-host semantic SLAM on a KITTI odometry
# sequence — semantic frontend (PTv3 semseg, config #3's checkpoint) filters
# dynamic classes, scan-to-map ICP odometry estimates the trajectory, ATE is
# evaluated against the KITTI ground truth. Run with tools/run_slam.py.

data_root = "data/semantic_kitti"
sequence = "00"
max_frames = None  # None = all

# semantic filtering (train-ids of dynamic classes; see
# datasets/semantic_kitti.py DYNAMIC_CLASSES)
semantic = dict(
    enabled=False,  # True requires a trained semseg checkpoint
    config="configs/semantic_kitti/semseg-ptv3-base.py",
    weight=None,
    dynamic_classes=(0, 1, 2, 3, 4, 5, 6, 7),
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

save_path = "exp/slam/kitti_odometry"
