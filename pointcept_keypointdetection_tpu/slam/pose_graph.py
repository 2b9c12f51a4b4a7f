"""Pose-graph optimization (Gauss-Newton over SE(3) keyframe poses).

Part of the SLAM backend (BASELINE.json north star; designed fresh — the
reference has no solver, SURVEY.md §2.9).  Static-shape: a fixed capacity of
nodes and edges with validity masks; the normal system is dense [6K, 6K]
(keyframe counts are hundreds at most), solved with a damped Cholesky.

Edge residual: ``r = log( Z_ij^-1 · (T_i^-1 T_j) )`` (right-perturbation
Jacobians approximated by first order — adequate for the small relative
errors of odometry graphs).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import se3


class PoseGraph(NamedTuple):
    # nodes
    R: jnp.ndarray  # [K, 3, 3]
    t: jnp.ndarray  # [K, 3]
    node_valid: jnp.ndarray  # bool[K]
    # edges: relative measurements Z_ij (i -> j)
    edge_i: jnp.ndarray  # int32[E]
    edge_j: jnp.ndarray  # int32[E]
    Z_R: jnp.ndarray  # [E, 3, 3]
    Z_t: jnp.ndarray  # [E, 3]
    edge_weight: jnp.ndarray  # f32[E] (0 = invalid)


def residuals(graph: PoseGraph) -> jnp.ndarray:
    """Per-edge 6-vector residuals [E, 6] (w, v)."""
    Ri = graph.R[graph.edge_i]
    ti = graph.t[graph.edge_i]
    Rj = graph.R[graph.edge_j]
    tj = graph.t[graph.edge_j]
    Rii, tii = se3.se3_inverse(Ri, ti)
    R_rel, t_rel = se3.se3_compose(Rii, tii, Rj, tj)  # T_i^-1 T_j
    ZRi, Zti = se3.se3_inverse(graph.Z_R, graph.Z_t)
    R_err, t_err = se3.se3_compose(ZRi, Zti, R_rel, t_rel)
    w = se3.so3_log(R_err)
    return jnp.concatenate([w, t_err], axis=-1)


def optimize(
    graph: PoseGraph,
    iters: int = 10,
    damping: float = 1e-6,
    fix_first: bool = True,
    prior_weight: float = 0.0,
) -> PoseGraph:
    """``prior_weight`` > 0 anchors every node to its INITIAL pose with that
    information weight (Tikhonov toward the odometry solution).  Scan-to-map
    odometry is absolutely accurate within its map horizon, so without
    priors the odometry edges (which constrain only relatives) leave the
    chain free to slide along its gauge valley toward noisy loop edges —
    measured: a 0.027 m-ATE trajectory degraded to 0.085 m from 4 loop
    edges even at 0.04 weight.  Priors make a loop edge move the chain only
    in proportion to its information against the odometry's.

    ``prior_weight`` may be a scalar (same weight on every node) or a
    per-node [K] vector — SemanticSLAM fades the prior on nodes spanned by
    high-information loop closures (a verified loop is direct evidence the
    absolute odometry poses inside its span drifted)."""
    K = graph.R.shape[0]
    R_prior = graph.R
    t_prior = graph.t
    prior_w = jnp.broadcast_to(jnp.asarray(prior_weight, jnp.float32), (K,))
    use_prior = bool(np.any(np.asarray(prior_weight) > 0)) if not isinstance(
        prior_weight, jnp.ndarray
    ) else True

    def gn_iter(_, g: PoseGraph) -> PoseGraph:
        r = residuals(g)  # [E, 6]

        # numeric Jacobians wrt the two incident poses via jvp on the local
        # parameterization (exact to machine precision, vectorized over edges)
        def edge_res(xi_i, xi_j, idx):
            dRi, dti = se3.se3_exp(xi_i)
            dRj, dtj = se3.se3_exp(xi_j)
            Ri = g.R[g.edge_i[idx]] @ dRi
            ti = (g.R[g.edge_i[idx]] @ dti[..., None])[..., 0] + g.t[g.edge_i[idx]]
            Rj = g.R[g.edge_j[idx]] @ dRj
            tj = (g.R[g.edge_j[idx]] @ dtj[..., None])[..., 0] + g.t[g.edge_j[idx]]
            Rii, tii = se3.se3_inverse(Ri, ti)
            R_rel, t_rel = se3.se3_compose(Rii, tii, Rj, tj)
            ZRi, Zti = se3.se3_inverse(g.Z_R[idx], g.Z_t[idx])
            R_err, t_err = se3.se3_compose(ZRi, Zti, R_rel, t_rel)
            return jnp.concatenate([se3.so3_log(R_err), t_err], axis=-1)

        E = g.edge_i.shape[0]
        zeros = jnp.zeros((E, 6))
        idxs = jnp.arange(E)
        Ji = jax.vmap(lambda idx: jax.jacfwd(lambda x: edge_res(x, jnp.zeros(6), idx))(jnp.zeros(6)))(idxs)
        Jj = jax.vmap(lambda idx: jax.jacfwd(lambda x: edge_res(jnp.zeros(6), x, idx))(jnp.zeros(6)))(idxs)

        w = g.edge_weight[:, None, None]
        # assemble dense H [K*6, K*6] and b [K*6]
        H = jnp.zeros((K, K, 6, 6))
        b = jnp.zeros((K, 6))
        H = H.at[g.edge_i, g.edge_i].add(w * jnp.einsum("eab,eac->ebc", Ji, Ji))
        H = H.at[g.edge_j, g.edge_j].add(w * jnp.einsum("eab,eac->ebc", Jj, Jj))
        H = H.at[g.edge_i, g.edge_j].add(w * jnp.einsum("eab,eac->ebc", Ji, Jj))
        H = H.at[g.edge_j, g.edge_i].add(w * jnp.einsum("eab,eac->ebc", Jj, Ji))
        b = b.at[g.edge_i].add(-jnp.einsum("eab,ea->eb", Ji, r * g.edge_weight[:, None]))
        b = b.at[g.edge_j].add(-jnp.einsum("eab,ea->eb", Jj, r * g.edge_weight[:, None]))

        if use_prior:
            # prior residual per node: log(T_prior^-1 T) (right-perturbation
            # Jacobian ~ identity to first order)
            w_prior = se3.so3_log(
                jnp.einsum("kij,kil->kjl", R_prior, g.R)  # R_prior^T R
            )
            v_prior = jnp.einsum("kij,ki->kj", R_prior, g.t - t_prior)
            r_prior = jnp.concatenate([w_prior, v_prior], axis=-1)  # [K, 6]
            H = H + prior_w[:, None, None, None] * (
                jnp.eye(6)[None, None] * jnp.eye(K)[:, :, None, None]
            )
            b = b - prior_w[:, None] * r_prior

        # gauge fixing by ELIMINATION: anchor node 0 (and clamp invalid
        # nodes) by zeroing their rows/columns and setting a unit diagonal —
        # a 1e8 diagonal boost pushes H's condition number to ~1e8, at the
        # edge of f32 linalg.solve precision (observed: spurious ~2 cm node
        # moves on a zero-residual chain)
        anchor = jnp.zeros((K,), bool).at[0].set(fix_first) | ~graph.node_valid
        free = jnp.repeat(~anchor, 6).astype(H.dtype)  # [K*6]
        H = H.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
        b = b.reshape(K * 6)
        H = H * free[:, None] * free[None, :] + jnp.diag(1.0 - free + damping)
        b = b * free
        delta = jnp.linalg.solve(H, b).reshape(K, 6)
        delta = jnp.where(anchor[:, None], 0.0, delta)

        dR, dt = se3.se3_exp(delta)
        R_new = g.R @ dR
        t_new = (g.R @ dt[..., None])[..., 0] + g.t
        return g._replace(R=R_new, t=t_new)

    return jax.lax.fori_loop(0, iters, gn_iter, graph)
