"""Pose graph + distributed Schur-complement BA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcept_keypointdetection_tpu.slam import se3
from pointcept_keypointdetection_tpu.slam.ba import BAProblem, ba_step, run_ba, run_ba_sharded
from pointcept_keypointdetection_tpu.slam.pose_graph import PoseGraph, optimize, residuals


def _random_pose(rng, scale=0.3):
    xi = rng.normal(size=6).astype(np.float32) * scale
    R, t = se3.se3_exp(jnp.asarray(xi))
    return np.asarray(R), np.asarray(t)


def test_pose_graph_converges(rng):
    # ground-truth chain of 5 poses; edges = consecutive + one loop closure
    K = 5
    R_gt, t_gt = [np.eye(3)], [np.zeros(3)]
    for i in range(1, K):
        dR, dt = _random_pose(rng, 0.2)
        R_gt.append(R_gt[-1] @ dR)
        t_gt.append(R_gt[-2] @ dt + t_gt[-1])
    R_gt, t_gt = np.stack(R_gt), np.stack(t_gt)

    edges = [(i, i + 1) for i in range(K - 1)] + [(0, K - 1)]
    Z_R, Z_t = [], []
    for i, j in edges:
        Ri_inv, ti_inv = se3.se3_inverse(jnp.asarray(R_gt[i]), jnp.asarray(t_gt[i]))
        Zr, Zt = se3.se3_compose(Ri_inv, ti_inv, jnp.asarray(R_gt[j]), jnp.asarray(t_gt[j]))
        Z_R.append(np.asarray(Zr))
        Z_t.append(np.asarray(Zt))

    # perturb all but the first node
    R0, t0 = [R_gt[0]], [t_gt[0]]
    for i in range(1, K):
        dR, dt = _random_pose(rng, 0.05)
        R0.append(R_gt[i] @ dR)
        t0.append(t_gt[i] + dt)

    graph = PoseGraph(
        R=jnp.asarray(np.stack(R0), jnp.float32),
        t=jnp.asarray(np.stack(t0), jnp.float32),
        node_valid=jnp.ones(K, bool),
        edge_i=jnp.asarray([e[0] for e in edges], jnp.int32),
        edge_j=jnp.asarray([e[1] for e in edges], jnp.int32),
        Z_R=jnp.asarray(np.stack(Z_R), jnp.float32),
        Z_t=jnp.asarray(np.stack(Z_t), jnp.float32),
        edge_weight=jnp.ones(len(edges)),
    )
    r0 = float(jnp.sum(jnp.square(residuals(graph))))
    out = optimize(graph, iters=8)
    r1 = float(jnp.sum(jnp.square(residuals(out))))
    assert r1 < r0 * 1e-3, (r0, r1)
    np.testing.assert_allclose(np.asarray(out.t), t_gt, atol=1e-3)


def _make_ba_problem(rng, K=4, L=64, O=3, noise=0.0, perturb=0.05):
    R_gt, t_gt = [np.eye(3, dtype=np.float32)], [np.zeros(3, np.float32)]
    for i in range(1, K):
        dR, dt = _random_pose(rng, 0.2)
        R_gt.append((R_gt[-1] @ dR).astype(np.float32))
        t_gt.append((t_gt[-1] + dt).astype(np.float32))
    R_gt, t_gt = np.stack(R_gt), np.stack(t_gt)
    landmarks_gt = rng.uniform(-5, 5, (L, 3)).astype(np.float32)

    obs_pose = rng.integers(0, K, (L, O)).astype(np.int32)
    z = np.zeros((L, O, 3), np.float32)
    for l in range(L):
        for o in range(O):
            i = obs_pose[l, o]
            z[l, o] = R_gt[i].T @ (landmarks_gt[l] - t_gt[i]) + rng.normal(0, noise, 3)

    # perturb initial estimates (pose 0 fixed)
    R0, t0 = [R_gt[0]], [t_gt[0]]
    for i in range(1, K):
        dR, dt = _random_pose(rng, perturb)
        R0.append((R_gt[i] @ dR).astype(np.float32))
        t0.append((t_gt[i] + dt).astype(np.float32))
    lm0 = landmarks_gt + rng.normal(0, perturb, landmarks_gt.shape).astype(np.float32)

    prob = BAProblem(
        R=jnp.asarray(np.stack(R0)),
        t=jnp.asarray(np.stack(t0)),
        landmarks=jnp.asarray(lm0),
        obs_pose=jnp.asarray(obs_pose),
        obs_z=jnp.asarray(z),
        obs_weight=jnp.ones((L, O)),
    )
    return prob, R_gt, t_gt, landmarks_gt


def test_ba_converges(rng):
    prob, R_gt, t_gt, lm_gt = _make_ba_problem(rng)
    out, msr = jax.jit(lambda p: run_ba(p, num_poses=4, iters=8))(prob)
    assert float(msr) < 1e-8, float(msr)
    np.testing.assert_allclose(np.asarray(out.t), t_gt, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.landmarks), lm_gt, atol=1e-3)


def test_ba_sharded_matches_single(rng):
    from pointcept_keypointdetection_tpu.parallel.mesh import create_mesh

    prob, R_gt, t_gt, lm_gt = _make_ba_problem(rng, L=64)
    mesh = create_mesh(data=8, model=1)
    out_s, msr_s = run_ba_sharded(prob, num_poses=4, mesh=mesh, iters=6)
    out_1, msr_1 = run_ba(prob, num_poses=4, iters=6)
    np.testing.assert_allclose(np.asarray(out_s.t), np.asarray(out_1.t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_s.landmarks), np.asarray(out_1.landmarks), atol=1e-4)
    np.testing.assert_allclose(float(msr_s), float(msr_1), rtol=1e-3, atol=1e-10)
