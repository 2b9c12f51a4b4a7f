# Drift-DOMINANT back-end benchmark (VERDICT r3 item 3): the synth_loop
# circuit with deliberately degraded odometry (coarse scan/map voxels past
# the density cliff PERF.md r3 measured: 5-NN plane fits at >=0.5 m neighbor
# spacing mix surfaces), so accumulated drift far exceeds the loop-closure
# noise floor — the regime where the back-end must WIN end-to-end, and where
# pose-gated loop candidates go blind (drift > any reasonable gate): the
# descriptor frontend (slam/frontend.py) proposes the revisit instead.
#
#   python tools/make_synthetic_kitti.py --out /tmp/synth_loop3 --frames 175 --loop \
#       --straight 40 --radius 16 --step 1.2 --n-cars 8
#   # odometry-only baseline:
#   python tools/run_slam.py --config-file configs/slam/synth_loop_drift.py \
#       --options slam=None
#   # full back-end:
#   python tools/run_slam.py --config-file configs/slam/synth_loop_drift.py

_base_ = ["./synth_loop.py"]

odometry = dict(
    # scan_capacity 16384 deliberately UNDER the measured 0.6 m-voxel scan
    # (~17.7k pts): pipeline.py randomly subsamples the ~7% overflow each
    # frame — part of the intentional odometry degradation of this circuit
    # (drift must dominate).  Map sized to the 25 m horizon at 0.5 m cells;
    # with max_corr_dist 1.0 the candidate ring is 27 cells (vs 64 at 1.2)
    # — together ~3.5x less ICP work per frame on CPU
    scan_capacity=16384,
    map_capacity=131072,
    scan_voxel=0.6,
    map_voxel=0.5,
    icp_iters=4,
    knn_k=5,
    max_corr_dist=1.0,
    huber_delta=0.3,
    min_planarity=0.5,
    map_radius=25.0,
    min_range=2.5,
    max_range=60.0,
    insert_rmse_gate=0.6,
    min_inlier_frac=0.08,
)

slam = dict(
    keyframe_dist=2.0,
    keyframe_angle=0.3,
    max_keyframes=1024,
    loop_closure=True,
    loop_min_gap=30,
    loop_max_dist=6.0,
    loop_min_inliers=800,
    optimize_every=15,
    keyframe_scan_size=4096,
    loop_descriptor=True,
    loop_desc_topk=2,
    loop_desc_min_sim=0.6,
    loop_desc_corr_dist=2.0,
)

save_path = "exp/slam/synth_loop_drift"
