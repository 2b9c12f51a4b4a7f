"""SLAM frontend: SE3 ops, ICP registration, voxel map, odometry loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcept_keypointdetection_tpu.slam import se3
from pointcept_keypointdetection_tpu.slam.evaluate import absolute_trajectory_error
from pointcept_keypointdetection_tpu.slam.pipeline import LidarOdometry, OdometryConfig
from pointcept_keypointdetection_tpu.slam.registration import point_to_plane_icp
from pointcept_keypointdetection_tpu.slam.voxel_map import VoxelMap, insert, prune


def test_se3_exp_log_roundtrip(rng):
    w = rng.normal(size=(16, 3)).astype(np.float32) * 0.5
    R = se3.so3_exp(jnp.asarray(w))
    w2 = np.asarray(se3.so3_log(R))
    np.testing.assert_allclose(w2, w, rtol=1e-3, atol=1e-4)
    # orthonormality
    RtR = np.asarray(R @ jnp.swapaxes(R, -1, -2))
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5)


def test_se3_compose_inverse(rng):
    xi = rng.normal(size=(6,)).astype(np.float32) * 0.3
    R, t = se3.se3_exp(jnp.asarray(xi))
    Ri, ti = se3.se3_inverse(R, t)
    Rc, tc = se3.se3_compose(R, t, Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), 0, atol=1e-5)


def _structured_world(rng, n=4000):
    """Ground plane + two walls + boxes — enough planar structure for ICP."""
    n1, n2, n3 = n // 2, n // 4, n - n // 2 - n // 4
    ground = np.stack([rng.uniform(-20, 20, n1), rng.uniform(-20, 20, n1), rng.normal(0, 0.01, n1)], 1)
    wall1 = np.stack([rng.uniform(-20, 20, n2), np.full(n2, 8.0) + rng.normal(0, 0.01, n2), rng.uniform(0, 4, n2)], 1)
    wall2 = np.stack([np.full(n3, -6.0) + rng.normal(0, 0.01, n3), rng.uniform(-20, 20, n3), rng.uniform(0, 4, n3)], 1)
    return np.concatenate([ground, wall1, wall2]).astype(np.float32)


def test_icp_recovers_known_transform(rng):
    world = _structured_world(rng)
    xi = np.array([0.01, -0.02, 0.03, 0.2, -0.1, 0.05], np.float32)
    R_gt, t_gt = se3.se3_exp(jnp.asarray(xi))
    # scan = world points observed from the gt pose: p_sensor = R^-1 (p_w - t)
    Ri, ti = se3.se3_inverse(R_gt, t_gt)
    scan = np.asarray(world @ np.asarray(Ri).T + np.asarray(ti))

    res = point_to_plane_icp(
        jnp.asarray(scan),
        jnp.ones(len(scan), bool),
        jnp.asarray(world),
        jnp.ones(len(world), bool),
        jnp.eye(3),
        jnp.zeros(3),
        iters=10,
        max_corr_dist=1.5,
    )
    np.testing.assert_allclose(np.asarray(res.R), np.asarray(R_gt), atol=2e-3)
    np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_gt), atol=1e-2)
    assert float(res.rmse) < 0.05


def test_voxel_map_insert_dedup(rng):
    vmap = VoxelMap.create(1024, 0.5, origin=(0.0, 0.0, 0.0))
    pts = rng.uniform(1, 20, (500, 3)).astype(np.float32)
    vmap = insert(vmap, jnp.asarray(pts), jnp.ones(500, bool))
    count1 = int(vmap.valid.sum())
    assert 0 < count1 <= 500
    # re-inserting the same points must not grow the map
    vmap2 = insert(vmap, jnp.asarray(pts), jnp.ones(500, bool))
    assert int(vmap2.valid.sum()) == count1
    # pruning far points shrinks it
    vmap3 = prune(vmap2, jnp.asarray([0.0, 0.0, 0.0]), 5.0)
    assert int(vmap3.valid.sum()) < count1


def test_odometry_on_synthetic_trajectory(rng):
    world = _structured_world(rng, n=6000)
    cfg = OdometryConfig(
        scan_capacity=2048, map_capacity=8192, scan_voxel=0.4, map_voxel=0.4,
        icp_iters=6, max_corr_dist=1.5, min_range=0.0, max_range=50.0,
        map_origin=(-50.0, -50.0, -20.0), map_radius=100.0,
    )
    odo = LidarOdometry(cfg)
    gt_positions = []
    for i in range(6):
        # sensor moves along x with slight yaw
        yaw = 0.01 * i
        R = np.asarray(se3.so3_exp(jnp.asarray([0, 0, yaw])))
        t = np.array([0.4 * i, 0.05 * i, 0.0])
        gt_positions.append(t)
        Ri, ti = R.T, -R.T @ t
        scan = (world @ Ri.T + ti).astype(np.float32)
        # sensor-local crop (mimic limited FOV/range)
        keep = np.linalg.norm(scan, axis=1) < 40
        odo.process(scan[keep])
    ate, _ = absolute_trajectory_error(odo.positions, np.array(gt_positions), align=False)
    assert ate < 0.1, ate


def test_closed_loop_odometry_tracks_synthetic_street():
    """Closed-loop regression for the velocity-damped scan-to-map odometry:
    10 frames of the synthetic street must track GT to centimeters (the
    round-2 failure mode was accelerating drift from undamped velocity)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import numpy as np
    from make_synthetic_kitti import build_world, trajectory

    from pointcept_keypointdetection_tpu.slam.pipeline import LidarOdometry, OdometryConfig

    rng = np.random.default_rng(0)
    world, _ = build_world(rng, length=30.0)
    poses = trajectory(10, step=0.6)
    odo = LidarOdometry(OdometryConfig(
        scan_capacity=4096, map_capacity=32768, scan_voxel=0.5, map_voxel=0.4,
        icp_iters=6, knn_k=5, max_corr_dist=1.0, min_planarity=0.5,
        map_radius=80.0, min_range=2.0, max_range=40.0,
    ))
    errs = []
    T0_inv = np.linalg.inv(poses[0])  # odometry world frame = first sensor pose
    for t in range(10):
        T = poses[t]
        local = (world - T[:3, 3]) @ T[:3, :3]
        r = np.linalg.norm(local, axis=1)
        keep = (r > 2.1) & (r < 40.0)
        pts = local[keep]
        if len(pts) > 20000:
            pts = pts[rng.choice(len(pts), 20000, replace=False)]
        pts = (pts + rng.normal(0, 0.02, pts.shape)).astype(np.float32)
        scan = np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], 1)
        pose = odo.process(scan)
        rel = T0_inv @ T
        errs.append(np.linalg.norm(pose[:3, 3] - rel[:3, 3]))
    assert max(errs) < 0.05, errs


def test_eig3x3_matches_eigh(rng):
    """Closed-form 3x3 smallest/mid eigenvalues + smallest eigenvector must
    match jnp.linalg.eigh (up to sign) on random SPD batches, including
    near-planar (rank-2) covariances like real plane fits."""
    from pointcept_keypointdetection_tpu.slam.registration import _eig3x3_smallest

    a = rng.normal(size=(500, 3, 3)).astype(np.float32)
    cov = a @ a.transpose(0, 2, 1)
    # append near-planar covariances: two large axes, one tiny
    b = rng.normal(size=(100, 3, 2)).astype(np.float32)
    planar = b @ b.transpose(0, 2, 1) + 1e-6 * np.eye(3, dtype=np.float32)
    cov = np.concatenate([cov, planar])
    lam_min, lam_mid, v = _eig3x3_smallest(jnp.asarray(cov))
    w, q = np.linalg.eigh(cov)
    np.testing.assert_allclose(np.asarray(lam_min), w[:, 0], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lam_mid), w[:, 1], rtol=2e-3, atol=2e-4)
    dot = np.abs(np.sum(np.asarray(v) * q[:, :, 0], axis=-1))
    assert (dot > 0.99).mean() > 0.98, dot.min()
