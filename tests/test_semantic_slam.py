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
