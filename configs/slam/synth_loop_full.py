_base_ = ["./synth_loop.py"]
# Full back-end on the 520-frame loop circuit: keyframes + ICP-verified loop
# closure + pose-graph optimization (ATE vs the odometry-only baseline is the
# back-end's drift-reduction evidence; PARITY.md table).

slam = dict(
    keyframe_dist=2.0,
    keyframe_angle=0.3,
    max_keyframes=1024,
    loop_closure=True,
    loop_min_gap=40,
    loop_max_dist=10.0,
    loop_min_inliers=1200,
    optimize_every=15,
    keyframe_scan_size=4096,
)

save_path = "exp/slam/synth_loop_full"
