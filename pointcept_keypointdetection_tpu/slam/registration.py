"""Point-to-plane ICP scan-to-map registration (Gauss-Newton, jit-safe).

The compute core of the FAST-LIO2-style odometry stage (BASELINE.json; no
reference implementation exists, SURVEY.md §2.9).  Per iteration:

1. transform scan points by the current pose estimate;
2. find the 5 nearest map points per scan point (grid-bucketed knn,
   `ops/knn.knn_bucketed` — the ikd-tree replacement: cell size =
   ``max_corr_dist`` makes it EXACT for every correspondence that would pass
   the distance gate, since any neighbor beyond one cell ring is rejected by
   ``max_corr_dist`` anyway; ~300x fewer distance ops than brute force at a
   262k-point map);
3. fit a local plane per correspondence (batched 3x3 eigendecomposition);
4. robust-weighted point-to-plane residuals -> one 6x6 normal-equation solve
   (Levenberg damped);
5. left-multiplicative SE(3) update.

Everything is static-shape: invalid scan/map points carry zero weight.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import build_knn_index, knn, knn_query_index
from . import se3


class RegistrationResult(NamedTuple):
    R: jnp.ndarray  # [3, 3]
    t: jnp.ndarray  # [3]
    rmse: jnp.ndarray  # scalar, weighted point-to-plane RMSE
    inliers: jnp.ndarray  # scalar, number of inlier correspondences


def _eig3x3_smallest(cov: jnp.ndarray):
    """Batched closed-form smallest/middle eigenvalues + smallest eigenvector
    of symmetric 3x3 matrices (trigonometric characteristic roots + best
    cross-product eigenvector).  Replaces jnp.linalg.eigh on the odometry hot
    path: the iterative LAPACK-style lowering costs ~52 ms per ICP iteration
    at [16k, 3, 3] on the bench backend; this is pure elementwise VPU work.
    Exactness-tested against eigh (tests/test_slam.py)."""
    a = cov
    q = jnp.trace(a, axis1=-2, axis2=-1) / 3.0
    eye = jnp.eye(3, dtype=a.dtype)
    aq = a - q[..., None, None] * eye
    p2 = jnp.sum(aq * aq, axis=(-2, -1))
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    b = aq / p[..., None, None]
    detb = jnp.linalg.det(b)
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam_max = q + 2.0 * p * jnp.cos(phi)
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam_mid = 3.0 * q - lam_max - lam_min
    # eigenvector of lam_min: any two independent rows of (A - lam_min I)
    # span the orthogonal complement; take the largest of the 3 cross
    # products for conditioning
    m = a - lam_min[..., None, None] * eye
    c0 = jnp.cross(m[..., 0, :], m[..., 1, :])
    c1 = jnp.cross(m[..., 0, :], m[..., 2, :])
    c2 = jnp.cross(m[..., 1, :], m[..., 2, :])
    n0 = jnp.sum(c0 * c0, axis=-1)
    n1 = jnp.sum(c1 * c1, axis=-1)
    n2 = jnp.sum(c2 * c2, axis=-1)
    best = jnp.stack([n0, n1, n2], axis=-1).argmax(axis=-1)
    v = jnp.take_along_axis(
        jnp.stack([c0, c1, c2], axis=-2), best[..., None, None], axis=-2
    )[..., 0, :]
    nrm = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-30))
    # degenerate (isotropic / rank-deficient) covariances: fall back to +z —
    # the planarity gate rejects these correspondences anyway
    ok = nrm[..., 0] > 1e-12
    v = jnp.where(ok[..., None], v / nrm, jnp.asarray([0.0, 0.0, 1.0], a.dtype))
    return lam_min, lam_mid, v


def _fit_planes(neighbors: jnp.ndarray, nbr_valid: jnp.ndarray):
    """neighbors [N, k, 3] -> (centroid [N, 3], normal [N, 3], planarity [N])."""
    w = nbr_valid.astype(jnp.float32)[..., None]
    count = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    centroid = jnp.sum(neighbors * w, axis=1) / count
    centered = (neighbors - centroid[:, None, :]) * w
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / count[..., None]
    lam_min, lam_mid, normal = _eig3x3_smallest(cov)
    planarity = 1.0 - lam_min / jnp.maximum(lam_mid, 1e-9)
    return centroid, normal, planarity


def point_to_plane_icp(
    source: jnp.ndarray,  # [N, 3] scan points (sensor frame)
    source_valid: jnp.ndarray,  # bool[N]
    target: jnp.ndarray,  # [M, 3] map points (world frame)
    target_valid: jnp.ndarray,  # bool[M]
    R_init: jnp.ndarray,
    t_init: jnp.ndarray,
    iters: int = 8,
    k: int = 5,
    max_corr_dist: float = 1.0,
    huber_delta: float = 0.3,
    damping: float = 1e-4,
    min_planarity: float = 0.7,
    bucketed: bool = True,
    cell_cap: int = 64,
    index_depth: Optional[int] = None,
    cell_size: Optional[float] = None,
    lattice_origin=None,
    search_every: int = 1,
) -> RegistrationResult:
    """``cell_cap`` must cover the densest possible search cell:
    ceil(max_corr_dist / map_voxel + 1)^3 points fit in one cell ring —
    an undersized cap silently truncates candidates as the map densifies,
    which biases the fitted planes and sends the odometry into a
    drift -> map-spray -> divergence spiral (observed at cap=32 on the
    synthetic street at ~frame 18).

    ``index_depth``: a caller-contracted bound on the target's cell span
    (span + 4 <= 2^depth).  Setting it small enough that 3*depth <= 31
    switches the correspondence search to single-lane u32 codes; either way
    the sorted-cell index is built ONCE and queried by all iterations (the
    target never changes inside the loop) — at 16 bits/2-lane the per-scan
    update was paying 7 redundant map-scale sorts.

    ``cell_size`` + ``lattice_origin``: pass the target's own dedup lattice
    (map_voxel + map origin) to bucket at UNIT-CELL granularity — each cell
    then holds at most one point, so ``cell_cap`` drops to 1 and the
    candidate set shrinks from ring27 x cap64 = 1728 rows to a sphere-pruned
    ~3-cell-radius ring of ~180 single rows, with no per-candidate code
    check (distance-only exactness; invalid rows sit at 1e9).

    ``search_every``: re-run the correspondence SEARCH (and the plane fits
    over its neighbor sets) only every m-th iteration.  The fitted local
    plane is a property of the map surface, not of the query pose, so
    between searches each iteration only recomputes the point-to-plane
    residual against the carried (centroid, normal) and re-gates on it —
    the search + [N,k,3] gathers + eigenfits, ~95% of an iteration's cost,
    drop out entirely.  Pose updates between GN iterations are cm-scale, so
    this is the classic lazy-ICP economy; 1 = reference semantics (search
    every iteration)."""
    n = source.shape[0]

    if bucketed:
        depth = index_depth if index_depth is not None else 16
        single = index_depth is not None and 3 * depth <= 31
        cell = cell_size if cell_size is not None else max_corr_dist
        unit_cell = cell_size is not None and lattice_origin is not None
        cap = 1 if unit_cell else cell_cap
        ring = int(np.ceil(max_corr_dist / cell)) if unit_cell else 1
        index = build_knn_index(
            target, cell, base_valid=target_valid, cell_cap=cap,
            depth=depth, single_lane=single, lattice_origin=lattice_origin,
        )

        def corr(p_w):
            return knn_query_index(
                index, p_w, k, cell, cell_cap=cap, depth=depth,
                ring_radius=ring, verify_codes=not unit_cell,
                lattice_origin=lattice_origin,
                # exact min-cell-distance ring prune: this search is gated at
                # max_corr_dist, so cells that cannot hold an in-gate point
                # are dropped (18% fewer candidate rows at the SLAM shape)
                ring_corr_cells=(max_corr_dist / cell) if unit_cell else None,
            )

    else:
        def corr(p_w):
            return knn(p_w, target, k, base_valid=target_valid)

    def search_and_fit(p_w):
        """Correspondence search + plane fits: (centroid, normal, planarity,
        nbr_count) per source point.  The fitted local plane is a property
        of the MAP surface, not of the query pose, so under lazy
        re-association (search_every > 1) it is carried unchanged between
        searches — per-iteration work reduces to residual + weights + the
        6x6 solve.  target_valid gate: the search's 1e9-sentinel rows price
        invalid map rows out of the distance top-k AND out of nbr_valid."""
        idx, sqd = corr(p_w)
        neighbors = jnp.take(target, idx, axis=0)  # [N, k, 3]
        nbr_valid = (sqd < max_corr_dist**2) & jnp.take(target_valid, idx, axis=0)
        centroid, normal, planarity = _fit_planes(neighbors, nbr_valid)
        return centroid, normal, planarity, jnp.sum(nbr_valid, axis=-1)

    def body(i, carry):
        R, t, _, _, fit_prev = carry
        p_w = source @ R.T + t  # [N, 3]
        if search_every <= 1:
            fit = search_and_fit(p_w)
        else:
            fit = jax.lax.cond(
                (i % search_every) == 0,
                lambda: search_and_fit(p_w),
                lambda: fit_prev,
            )
        centroid, normal, planarity, nbr_count = fit

        r = jnp.sum(normal * (p_w - centroid), axis=-1)  # [N]
        good = (
            source_valid
            & (nbr_count >= 3)
            & (planarity > min_planarity)
            & (jnp.abs(r) < max_corr_dist)
        )
        # Huber weights
        absr = jnp.abs(r)
        w = jnp.where(absr <= huber_delta, 1.0, huber_delta / jnp.maximum(absr, 1e-9))
        w = w * good.astype(jnp.float32)

        # rotation parameterized about the CURRENT SENSOR POSITION: lever
        # arms are point ranges (<= max_range), not distances from the world
        # origin — world-origin lever arms grow with |t| and progressively
        # ill-condition the 6x6 system (observed as onset-at-|t|~11m drift
        # regardless of scene content)
        lever = p_w - t
        J = jnp.concatenate([jnp.cross(lever, normal), normal], axis=-1)  # [N, 6]
        H = jnp.einsum("ni,n,nj->ij", J, w, J) + damping * jnp.eye(6)
        g = jnp.einsum("ni,n->i", J, w * r)
        delta = -jnp.linalg.solve(H, g)
        dR, dt = se3.se3_exp(delta)
        R_new = dR @ R
        t_new = t + dt  # rotation pivots on t, so t only takes the dt shift
        # health stats from THIS iteration's converged correspondences (the
        # iterated-ICP convention: the final iterate's residuals ARE the
        # registration quality; a separate post-loop search would cost one
        # more full correspondence round for a one-GN-step-fresher number)
        wsum = jnp.maximum(jnp.sum(good), 1)
        rmse = jnp.sqrt(jnp.sum(jnp.square(r) * good) / wsum)
        return R_new, t_new, rmse, jnp.sum(good), fit

    fit0 = (
        jnp.zeros((n, 3), jnp.float32),
        jnp.zeros((n, 3), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.int32),
    )
    R, t, rmse, inliers, _ = jax.lax.fori_loop(
        0,
        iters,
        body,
        (R_init, t_init, jnp.asarray(0.0), jnp.asarray(0, jnp.int32), fit0),
    )
    return RegistrationResult(R=R, t=t, rmse=rmse, inliers=inliers)
