_base_ = ["./kitti_odometry.py"]
# BASELINE config #4, full back-end: semantic frontend + scan-to-map ICP
# odometry + keyframing + ICP-verified loop closure + pose-graph optimization
# (tools/run_slam.py switches to the SemanticSLAM engine when `slam` is set).

slam = dict(
    keyframe_dist=2.0,
    keyframe_angle=0.3,
    max_keyframes=2048,
    loop_closure=True,
    loop_min_gap=50,
    loop_max_dist=10.0,
    loop_min_inliers=1500,
    optimize_every=20,
    keyframe_scan_size=4096,
)

save_path = "exp/slam/kitti_odometry_full"
