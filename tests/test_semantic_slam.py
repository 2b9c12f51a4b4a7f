"""IMU preintegration + full SemanticSLAM orchestrator."""

import jax.numpy as jnp
import numpy as np

from pointcept_keypointdetection_tpu.slam import se3
from pointcept_keypointdetection_tpu.slam.evaluate import absolute_trajectory_error
from pointcept_keypointdetection_tpu.slam.imu import ImuState, propagate
from pointcept_keypointdetection_tpu.slam.pipeline import OdometryConfig
from pointcept_keypointdetection_tpu.slam.semantic_slam import SemanticSLAM, SlamConfig


def test_imu_propagation_constant_accel():
    state = ImuState.identity()
    T = 20
    dt = jnp.full((T,), 0.01)
    gyro = jnp.zeros((T, 3))
    # body accel must cancel gravity and add 1 m/s^2 in +x
    accel = jnp.tile(jnp.asarray([1.0, 0.0, 9.81]), (T, 1))
    out = propagate(state, gyro, accel, dt)
    t_total = 0.2
    np.testing.assert_allclose(np.asarray(out.v), [t_total * 1.0, 0, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.p), [0.5 * t_total**2, 0, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.R), np.eye(3), atol=1e-6)


def test_imu_propagation_rotation():
    state = ImuState.identity()
    T = 100
    dt = jnp.full((T,), 0.01)
    gyro = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (T, 1))  # 1 rad/s yaw
    accel = jnp.tile(jnp.asarray([0.0, 0.0, 9.81]), (T, 1))
    out = propagate(state, gyro, accel, dt)
    expected = np.asarray(se3.so3_exp(jnp.asarray([0.0, 0.0, 1.0])))
    np.testing.assert_allclose(np.asarray(out.R), expected, atol=1e-3)


def _structured_world(rng, n=6000):
    n1, n2, n3 = n // 2, n // 4, n - n // 2 - n // 4
    ground = np.stack([rng.uniform(-25, 25, n1), rng.uniform(-25, 25, n1), rng.normal(0, 0.01, n1)], 1)
    wall1 = np.stack([rng.uniform(-25, 25, n2), np.full(n2, 8.0) + rng.normal(0, 0.01, n2), rng.uniform(0, 4, n2)], 1)
    wall2 = np.stack([np.full(n3, -6.0) + rng.normal(0, 0.01, n3), rng.uniform(-25, 25, n3), rng.uniform(0, 4, n3)], 1)
    return np.concatenate([ground, wall1, wall2]).astype(np.float32)


def test_semantic_slam_keyframes_and_graph(rng):
    world = _structured_world(rng)
    cfg = SlamConfig(
        odometry=OdometryConfig(
            scan_capacity=2048, map_capacity=8192, scan_voxel=0.4, map_voxel=0.4,
            icp_iters=6, max_corr_dist=1.5, min_range=0.0, max_range=60.0,
            map_origin=(-60.0, -60.0, -20.0), map_radius=120.0,
        ),
        keyframe_dist=0.5,
        loop_closure=False,
        optimize_every=4,
        keyframe_scan_size=1024,
    )
    slam = SemanticSLAM(cfg)
    gt = []
    for i in range(8):
        t = np.array([0.4 * i, 0.0, 0.0])
        gt.append(t)
        scan = (world - t).astype(np.float32)
        keep = np.linalg.norm(scan, axis=1) < 45
        slam.process(scan[keep])
    ate, _ = absolute_trajectory_error(slam.positions, np.array(gt), align=False)
    assert ate < 0.15, ate
    assert len(slam.kf_R) >= 2
    assert len(slam.edges) >= 1


def test_loop_closure_reduces_drift(rng):
    """A drifted keyframe chain returning to its start: the ICP-verified loop
    edge + pose-graph solve must cut ATE well below the drifted chain's
    (the internalized FAST-LIO2-style back-end claim, SURVEY.md section 2.9)."""
    world = _structured_world(rng)
    cfg = SlamConfig(loop_min_gap=10, loop_max_dist=4.0, loop_min_inliers=200,
                     keyframe_scan_size=2048)
    slam = SemanticSLAM(cfg)

    # square loop, 0.5 m steps, ending back at the origin
    steps = (
        [(0.5 * i, 0.0) for i in range(8)]
        + [(3.5, 0.5 * i) for i in range(1, 8)]
        + [(3.5 - 0.5 * i, 3.5) for i in range(1, 8)]
        + [(0.0, 3.5 - 0.5 * i) for i in range(1, 8)]
    )
    gt = np.array([[x, y, 0.0] for x, y in steps], np.float32)
    K = len(gt)
    # odometry drift grows linearly along the trajectory
    drift = np.cumsum(np.tile([0.02, 0.012, 0.0], (K, 1)), axis=0).astype(np.float32)
    drift[0] = 0
    est = gt + drift

    for k in range(K):
        # keyframe scan: the world observed from the TRUE pose
        scan = (world - gt[k]).astype(np.float32)
        keep = np.linalg.norm(scan, axis=1) < 30
        scan = scan[keep][: cfg.keyframe_scan_size]
        stored = np.zeros((cfg.keyframe_scan_size, 3), np.float32)
        stored_valid = np.zeros(cfg.keyframe_scan_size, bool)
        stored[: len(scan)] = scan
        stored_valid[: len(scan)] = True
        slam.kf_R.append(np.eye(3, dtype=np.float32))
        slam.kf_t.append(est[k].copy())
        slam.kf_scan.append(stored)
        slam.kf_scan_valid.append(stored_valid)
        slam.kf_frame.append(k)
        if k > 0:
            # sequential edges consistent with the DRIFTED chain (the graph
            # alone cannot undo drift; only the loop edge can)
            slam.edges.append(
                (k - 1, k, np.eye(3, dtype=np.float32), est[k] - est[k - 1], 1.0)
            )

    from pointcept_keypointdetection_tpu.slam.evaluate import absolute_trajectory_error

    ate_before, _ = absolute_trajectory_error(np.stack(slam.kf_t), gt, align=False)
    n_edges = len(slam.edges)
    slam._try_loop_closure(K - 1)
    assert len(slam.edges) == n_edges + 1, "loop closure not detected/verified"
    j, k_, _, Z_t, w = slam.edges[-1][0], slam.edges[-1][1], *slam.edges[-1][2:]
    assert k_ - j >= cfg.loop_min_gap and w > 1.0  # clean scans -> high information
    slam._optimize_graph()
    ate_after, _ = absolute_trajectory_error(np.stack(slam.kf_t), gt, align=False)
    assert ate_after < ate_before * 0.5, (ate_before, ate_after)


def test_noisy_loop_edge_cannot_degrade_consistent_chain():
    """Prior-anchored solve: a CONSISTENT keyframe chain (zero-residual
    odometry edges) plus one noisy low-weight loop edge must stay put —
    without priors the chain slides along its gauge valley toward the loop
    edge (measured 0.027 -> 0.085 m ATE on the circuit run)."""
    import jax.numpy as jnp

    from pointcept_keypointdetection_tpu.slam.pose_graph import PoseGraph, optimize

    K = 24
    t = np.stack([np.linspace(0, 11.5, K), np.zeros(K), np.zeros(K)], 1).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    ei = np.arange(K - 1, dtype=np.int32)
    ej = ei + 1
    Z_R = np.tile(np.eye(3, dtype=np.float32), (K - 1, 1, 1))
    Z_t = t[1:] - t[:-1]
    w = np.ones(K - 1, np.float32)
    # noisy loop edge 0 -> K-1 (off by 30 cm), information-weighted low
    ei = np.append(ei, 0).astype(np.int32)
    ej = np.append(ej, K - 1).astype(np.int32)
    Z_R = np.concatenate([Z_R, np.eye(3, dtype=np.float32)[None]])
    Z_t = np.concatenate([Z_t, (t[-1] - t[0] + [0.3, 0.2, 0.0])[None]])
    w = np.append(w, 0.04).astype(np.float32)

    graph = PoseGraph(
        R=jnp.asarray(R), t=jnp.asarray(t), node_valid=jnp.ones(K, bool),
        edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
        Z_R=jnp.asarray(Z_R), Z_t=jnp.asarray(Z_t), edge_weight=jnp.asarray(w),
    )
    out_anchored = optimize(graph, iters=6, prior_weight=0.2)
    move = np.linalg.norm(np.asarray(out_anchored.t) - t, axis=1).max()
    # the exact LS solution moves the end node w/(w + prior + chain coupling)
    # of the 0.36 m loop residual ~= 0.026 m, decaying exponentially into the
    # chain (length scale ~ 1/sqrt(prior)); bound it at 1.5x that compromise
    # (upper bound w/(w+prior)*|r| = 0.060; free solve measures 0.238)
    assert move < 0.04, move
    out_free = optimize(graph, iters=6, prior_weight=0.0)
    move_free = np.linalg.norm(np.asarray(out_free.t) - t, axis=1).max()
    assert move_free > 4 * move  # priors cut the slide by a large factor


def test_final_trajectory_retro_correction(rng):
    """final_trajectory re-bases every frame on its anchor keyframe's
    OPTIMIZED pose: with no corrections it reproduces the live trajectory,
    and a rigid keyframe correction moves anchored frames rigidly with it
    (how a loop closure found late fixes the whole history)."""
    world = _structured_world(rng)
    cfg = SlamConfig(
        odometry=OdometryConfig(
            scan_capacity=2048, map_capacity=8192, scan_voxel=0.4, map_voxel=0.4,
            icp_iters=6, max_corr_dist=1.5, min_range=0.0, max_range=60.0,
            map_origin=(-60.0, -60.0, -20.0), map_radius=120.0,
        ),
        keyframe_dist=0.9,
        loop_closure=False,
        optimize_every=0,  # no solves: live == retro baseline
        keyframe_scan_size=1024,
    )
    slam = SemanticSLAM(cfg)
    for i in range(6):
        t = np.array([0.4 * i, 0.0, 0.0])
        scan = (world - t).astype(np.float32)
        keep = np.linalg.norm(scan, axis=1) < 45
        slam.process(scan[keep])
    assert len(slam._anchors) == 6
    assert 2 <= len(slam.kf_R) < 6  # some frames anchored to non-self keyframes
    final0 = slam.final_trajectory(optimize_final=False)
    np.testing.assert_allclose(final0[:, :3, 3], slam.positions, atol=1e-5)
    # simulate a back-end correction: rigidly shift all keyframes
    delta = np.array([0.3, -0.2, 0.1], np.float32)
    for i in range(len(slam.kf_t)):
        slam.kf_t[i] = slam.kf_t[i] + delta
    final1 = slam.final_trajectory(optimize_final=False)
    np.testing.assert_allclose(final1[:, :3, 3], final0[:, :3, 3] + delta, atol=1e-5)


def test_run_slam_cli_full_backend(rng, tmp_path, monkeypatch, capsys):
    """tools/run_slam.py with a `slam` config section drives the full
    SemanticSLAM back-end (keyframes/loop/pose-graph) over a synthetic KITTI
    sequence layout and reports ATE/RPE."""
    import sys

    sys.path.insert(0, "tools")
    world = _structured_world(rng)

    seq_dir = tmp_path / "dataset" / "sequences" / "00" / "velodyne"
    seq_dir.mkdir(parents=True)
    gt = []
    for i in range(6):
        t = np.array([0.6 * i, 0.0, 0.0], np.float32)
        gt.append(t)
        scan = (world - t).astype(np.float32)
        keep = np.linalg.norm(scan, axis=1) < 40
        scan = scan[keep]
        data = np.concatenate([scan, np.ones((len(scan), 1), np.float32)], axis=1)
        data.tofile(seq_dir / f"{i:06d}.bin")
    poses_dir = tmp_path / "dataset" / "poses"
    poses_dir.mkdir()
    rows = []
    for t in gt:
        P = np.eye(4)[:3]
        P[:, 3] = t
        rows.append(P.reshape(-1))
    np.savetxt(poses_dir / "00.txt", np.stack(rows), fmt="%.6f")

    cfg = tmp_path / "cfg.py"
    cfg.write_text(
        f"""
data_root = {str(tmp_path)!r}
sequence = "00"
max_frames = None
semantic = dict(enabled=False)
odometry = dict(
    scan_capacity=2048, map_capacity=8192, scan_voxel=0.4, map_voxel=0.4,
    icp_iters=6, max_corr_dist=1.5, min_range=0.0, max_range=60.0,
    map_origin=(-60.0, -60.0, -20.0), map_radius=120.0,
)
slam = dict(
    keyframe_dist=0.5, loop_closure=False, optimize_every=3,
    keyframe_scan_size=1024,
)
save_path = {str(tmp_path / 'exp')!r}
"""
    )
    import run_slam

    monkeypatch.setattr(sys, "argv", ["run_slam.py", "--config-file", str(cfg)])
    run_slam.main()
    out = capsys.readouterr().out
    assert "ATE RMSE" in out
    ate = float(out.split("ATE RMSE:")[1].split("m")[0])
    assert ate < 0.5, out
    assert (tmp_path / "exp" / "traj_00.txt").exists()


def test_model_label_path_wires_learned_embedding(rng, tmp_path):
    """tools/run_slam.py's model-label path returns (labels, learned
    embedding) per scan — the embedding being the masked-mean pooled backbone
    features sown by the segmentor wrapper — and SemanticSLAM.process threads
    it into the keyframe place-recognition descriptor (VERDICT r4 item 2;
    frontend docstring contract)."""
    import sys

    sys.path.insert(0, "tools")
    import run_slam

    from pointcept_keypointdetection_tpu.utils.config import Config

    sem_cfg = tmp_path / "sem.py"
    sem_cfg.write_text(
        """
model = dict(
    type="DefaultSegmentor",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=4,  # coord + strength (run_slam's per-scan featurization)
        num_classes=6,
        base_channels=8,
        channels=(8, 8, 8, 8, 8, 8, 8, 8),
        layers=(1, 1, 1, 1, 1, 1, 1, 1),
        stem_kernel=3,
        bn_momentum=0.1,
    ),
)
"""
    )
    cfg = tmp_path / "cfg.py"
    cfg.write_text(
        f"""
semantic = dict(
    enabled=True, labels_from="model", config={str(sem_cfg)!r}, weight=None,
    slot=4096, dynamic_classes=(),
)
"""
    )
    infer = run_slam._build_semseg(Config.fromfile(str(cfg)))
    world = _structured_world(rng, n=3000)
    scan = np.concatenate([world, np.ones((len(world), 1), np.float32)], 1)
    labels, emb = infer(scan)
    assert labels.shape == (len(scan),)
    assert emb.ndim == 1 and emb.shape[0] == 6  # backbone_feat dim
    assert np.isfinite(emb).all() and np.abs(emb).sum() > 0

    slam_cfg = SlamConfig(
        odometry=OdometryConfig(
            scan_capacity=2048, map_capacity=8192, scan_voxel=0.4, map_voxel=0.4,
            icp_iters=2, max_corr_dist=1.5, min_range=0.0, max_range=60.0,
            map_origin=(-60.0, -60.0, -20.0), map_radius=120.0,
        ),
        keyframe_scan_size=512,
    )
    slam = SemanticSLAM(slam_cfg)
    slam.process(scan, labels, embedding=emb)
    dcfg = slam.descriptor_cfg
    base = dcfg.range_bins * dcfg.height_bins + dcfg.num_classes
    assert len(slam.descriptor_index.descriptor(0)) == base + emb.shape[0]
