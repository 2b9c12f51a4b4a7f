"""Distributed Schur-complement bundle adjustment.

The multi-host centerpiece of the BASELINE.json north star: landmarks (map
points / block anchors) are SHARDED over the mesh's data axis; each shard
builds its landmark Hessians and Schur contributions locally, a ``psum``
reduces the pose system over ICI, every device solves the small reduced pose
system redundantly, and landmark updates back-substitute shard-locally.
Designed fresh (no reference implementation, SURVEY.md §2.9, §7.3).

Problem form (point-cloud BA):
  observation o: keyframe ``pose_idx[o]`` saw landmark ``lm_idx[o]`` at
  sensor-frame position ``z[o]``; residual r = T_i^{-1} l - z with
  right-perturbation Jacobians J_pose = [hat(p), -I], J_lm = R_i^T, where
  p = T_i^{-1} l.

Shapes are static: L landmarks x O observations-per-landmark (padded, weight
0 invalid), K keyframes. The Schur complement is assembled as dense
[K, K, 6, 6] via scatter-adds — K is keyframe-window sized (tens).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import se3


class BAProblem(NamedTuple):
    # keyframes
    R: jnp.ndarray  # [K, 3, 3]
    t: jnp.ndarray  # [K, 3]
    # landmarks (sharded dim)
    landmarks: jnp.ndarray  # [L, 3]
    # observations grouped per landmark
    obs_pose: jnp.ndarray  # int32[L, O] keyframe index
    obs_z: jnp.ndarray  # [L, O, 3] sensor-frame measurement
    obs_weight: jnp.ndarray  # [L, O] (0 = padding)


def _residual_jacobians(prob: BAProblem):
    """Per-observation residuals + Jacobians (vectorized [L, O, ...])."""
    Ri = prob.R[prob.obs_pose]  # [L, O, 3, 3]
    ti = prob.t[prob.obs_pose]  # [L, O, 3]
    # p = R_i^T (l - t_i)
    diff = prob.landmarks[:, None, :] - ti
    p = jnp.einsum("lokj,lok->loj", Ri, diff)  # R^T d
    r = p - prob.obs_z  # [L, O, 3]
    J_lm = jnp.swapaxes(Ri, -1, -2)  # [L, O, 3, 3] = R_i^T
    J_pose = jnp.concatenate([se3.hat(p), -jnp.broadcast_to(jnp.eye(3), Ri.shape)], axis=-1)  # [L, O, 3, 6]
    return r, J_pose, J_lm


def ba_step(
    prob: BAProblem,
    num_poses: int,
    damping: float = 1e-4,
    fix_first: bool = True,
    axis_name: Optional[str] = None,
) -> Tuple[BAProblem, jnp.ndarray]:
    """One damped Gauss-Newton step with Schur elimination of landmarks.

    When ``axis_name`` is set (inside shard_map), the pose-system assembly is
    psum-reduced across landmark shards.
    Returns (updated problem, mean squared residual).
    """
    K = num_poses
    r, J_pose, J_lm = _residual_jacobians(prob)
    w = prob.obs_weight[..., None]

    # landmark blocks
    Hll = jnp.einsum("loab,loac->lbc", J_lm * w[..., None], J_lm)  # [L, 3, 3]
    Hll = Hll + damping * jnp.eye(3)
    Hll_inv = jnp.linalg.inv(Hll)
    b_l = -jnp.einsum("loab,loa->lb", J_lm * w[..., None], r)  # [L, 3]

    # pose blocks per observation
    Hpp_obs = jnp.einsum("loab,loac->lobc", J_pose * w[..., None], J_pose)  # [L, O, 6, 6]
    b_p_obs = -jnp.einsum("loab,loa->lob", J_pose * w[..., None], r)  # [L, O, 6]
    Hpl_obs = jnp.einsum("loab,loac->lobc", J_pose * w[..., None], J_lm)  # [L, O, 6, 3]

    # per-landmark pose-coupling: B_i = sum_obs-from-i Hpl  (scatter over O)
    # Schur pairs: for each landmark, all (o1, o2) pose pairs couple.
    Hpp = jnp.zeros((K, K, 6, 6))
    b_p = jnp.zeros((K, 6))
    Hpp = Hpp.at[prob.obs_pose, prob.obs_pose].add(Hpp_obs, mode="drop")
    b_p = b_p.at[prob.obs_pose].add(b_p_obs, mode="drop")

    # Schur: S -= B_i Hll^-1 B_j^T for all pose pairs of each landmark
    A = jnp.einsum("loab,lbc->loac", Hpl_obs, Hll_inv)  # [L, O, 6, 3]
    S_pair = jnp.einsum("loab,lpcb->lopac", A, Hpl_obs)  # [L, O, O, 6, 6]
    rhs_pair = jnp.einsum("loab,lb->loa", A, b_l)  # [L, O, 6]
    o = prob.obs_pose.shape[1]
    ii = jnp.broadcast_to(prob.obs_pose[:, :, None], S_pair.shape[:3])
    jj = jnp.broadcast_to(prob.obs_pose[:, None, :], S_pair.shape[:3])
    Hpp = Hpp.at[ii, jj].add(-S_pair, mode="drop")
    b_p = b_p.at[prob.obs_pose].add(-rhs_pair, mode="drop")

    sq = jnp.sum(jnp.square(r) * w)
    cnt = jnp.sum(w)
    if axis_name is not None:
        Hpp = jax.lax.psum(Hpp, axis_name)
        b_p = jax.lax.psum(b_p, axis_name)
        sq = jax.lax.psum(sq, axis_name)
        cnt = jax.lax.psum(cnt, axis_name)

    # solve reduced pose system (every device redundantly — it's tiny)
    H = Hpp.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
    anchor = jnp.zeros((K,), bool).at[0].set(fix_first)
    H = H + jnp.diag(jnp.repeat(anchor.astype(jnp.float32), 6) * 1e8 + damping)
    delta_p = jnp.linalg.solve(H, b_p.reshape(K * 6)).reshape(K, 6)
    delta_p = jnp.where(anchor[:, None], 0.0, delta_p)

    # back-substitute landmarks (shard-local)
    corr = jnp.einsum("loab,lob->loa", jnp.swapaxes(Hpl_obs, -1, -2), delta_p[prob.obs_pose])
    delta_l = jnp.einsum("lab,lb->la", Hll_inv, b_l - jnp.sum(corr * (w > 0), axis=1))

    dR, dt = se3.se3_exp(delta_p)
    R_new = prob.R @ dR
    t_new = (prob.R @ dt[..., None])[..., 0] + prob.t
    new_prob = prob._replace(R=R_new, t=t_new, landmarks=prob.landmarks + delta_l)
    return new_prob, sq / jnp.maximum(cnt, 1.0)


def run_ba(prob: BAProblem, num_poses: int, iters: int = 5, **kwargs):
    def body(_, carry):
        p, _ = carry
        return ba_step(p, num_poses, **kwargs)

    return jax.lax.fori_loop(0, iters, body, (prob, jnp.asarray(0.0)))


def run_ba_sharded(prob: BAProblem, num_poses: int, mesh, iters: int = 5, **kwargs):
    """Landmark-sharded BA over the mesh's 'data' axis via shard_map.

    Pose state replicates; landmark-indexed arrays shard on dim 0.  The
    per-shard Schur systems meet in a psum (ICI collective) each iteration.
    """
    from functools import partial

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    lm_spec = BAProblem(
        R=P(), t=P(), landmarks=P("data"), obs_pose=P("data"), obs_z=P("data"), obs_weight=P("data")
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(lm_spec,),
        out_specs=(lm_spec, P()),
    )
    def sharded(p):
        def body(_, carry):
            pp, _ = carry
            return ba_step(pp, num_poses, axis_name="data", **kwargs)

        return jax.lax.fori_loop(0, iters, body, (p, jnp.asarray(0.0)))

    return jax.jit(sharded)(prob)
