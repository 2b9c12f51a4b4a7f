"""LiDAR odometry pipeline (FAST-LIO2-style scan-to-map frontend).

Internalizes the odometry stage the reference delegates to an external ROS
FAST-LIO2 (SURVEY.md §2.9): per scan — semantic dynamic-object filtering
(`fusion_clean_bag.py:93-95` drops dynamic classes), voxel downsample,
constant-velocity pose prediction, point-to-plane ICP against the sliding
voxel map, then map insertion/pruning.  The whole per-scan update is ONE
jitted function with static shapes; the host loop only feeds scans and
records poses.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import se3
from .registration import point_to_plane_icp
from .voxel_map import VoxelMap, insert, prune


@dataclasses.dataclass
class OdometryConfig:
    scan_capacity: int = 16384  # padded downsampled scan size
    map_capacity: int = 262144
    scan_voxel: float = 0.5
    map_voxel: float = 0.4
    # 8 GN iterations: the damped constant-velocity prior is cm-accurate
    # (round-2 analysis), well inside the convergence basin — every
    # validated config (street, KITTI, loop circuit) uses <= 8; the old
    # default 12 just billed 5 extra correspondence searches per scan
    icp_iters: int = 8
    # re-run the correspondence search only every m-th GN iteration
    # (registration.point_to_plane_icp search_every): the search is ~90% of
    # an iteration's cost while inter-iteration pose deltas are cm-scale.
    # 1 = search every iteration (exact reference semantics)
    search_every: int = 1
    knn_k: int = 5
    max_corr_dist: float = 1.0
    huber_delta: float = 0.3
    min_planarity: float = 0.7
    map_radius: float = 150.0
    min_range: float = 2.5  # drop ego returns
    max_range: float = 80.0
    dynamic_classes: Tuple[int, ...] = ()  # semantic train-ids to drop
    map_origin: Tuple[float, float, float] = (-800.0, -800.0, -200.0)
    max_motion: float = 3.0  # per-frame translation clamp (m); see step()
    # accept ICP + insert the scan into the map only when at least this
    # fraction of scan points found inlier correspondences — a degraded
    # registration must not poison the map (drift -> spray feedback)
    min_inlier_frac: float = 0.25
    # additionally require the registration residual to stay below this RMSE
    # before fusing a scan: slightly-off insertions thicken surfaces in the
    # error direction and the plane fits then CHASE the error (observed as
    # accelerating drift); a well-registered-only map breaks the feedback
    insert_rmse_gate: float = 0.08
    # leaky constant-velocity prediction: v_pred = velocity_damping * v.
    # Single-frame ICP is mm-accurate given a clean prior (measured), but an
    # UNdamped velocity model integrates any systematic mm-level ICP bias
    # quadratically (error -> velocity -> error), which is what actually
    # destabilized the closed loop; the damped prediction error
    # (1-gamma)*v ~ cm stays deep inside ICP's convergence basin
    velocity_damping: float = 0.9


class LidarOdometry:
    def __init__(self, config: Optional[OdometryConfig] = None):
        self.cfg = config or OdometryConfig()
        self.vmap = VoxelMap.create(self.cfg.map_capacity, self.cfg.map_voxel, self.cfg.map_origin)
        self.poses: List[np.ndarray] = []  # [4, 4] world_T_sensor
        self._R = jnp.eye(3)
        self._t = jnp.zeros(3)
        self._R_prev = jnp.eye(3)
        self._t_prev = jnp.zeros(3)
        self._step = self._build_step()
        self._frame = 0

    # -- host-side preprocessing ----------------------------------------
    def _preprocess(self, scan: np.ndarray, labels: Optional[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
        cfg = self.cfg
        pts = scan[:, :3].astype(np.float32)
        keep = np.isfinite(pts).all(axis=1)
        rng = np.linalg.norm(pts, axis=1)
        keep &= (rng > cfg.min_range) & (rng < cfg.max_range)
        if labels is not None and cfg.dynamic_classes:
            keep &= ~np.isin(labels, cfg.dynamic_classes)
        pts = pts[keep]
        # one point per voxel
        grid = np.floor(pts / cfg.scan_voxel).astype(np.int64)
        grid -= grid.min(0) if len(grid) else 0
        from ..ops.serialization import z_order_encode_np

        if len(pts):
            key = z_order_encode_np(np.minimum(grid, 2**16 - 1), depth=16)
            _, first = np.unique(key, return_index=True)
            pts = pts[np.sort(first)]
        n = len(pts)
        if n > cfg.scan_capacity:
            sel = np.random.default_rng(0).choice(n, cfg.scan_capacity, replace=False)
            pts = pts[sel]
            n = cfg.scan_capacity
        out = np.zeros((cfg.scan_capacity, 3), np.float32)
        out[:n] = pts
        valid = np.zeros(cfg.scan_capacity, bool)
        valid[:n] = True
        return out, valid

    # -- jitted per-scan update -----------------------------------------
    def _build_step(self):
        cfg = self.cfg

        def step(vmap: VoxelMap, R_prev, t_prev, R_prev2, t_prev2, scan, valid, do_icp):
            # constant-velocity prediction: T_pred = T_prev (T_prev2^-1 T_prev)
            Ri, ti = se3.se3_inverse(R_prev2, t_prev2)
            dR, dt = se3.se3_compose(Ri, ti, R_prev, t_prev)
            # damp the velocity (see OdometryConfig.velocity_damping)
            g = cfg.velocity_damping
            dt = g * dt
            dR = se3.so3_exp(g * se3.so3_log(dR))
            R0, t0 = se3.se3_compose(R_prev, t_prev, dR, dt)
            # physical-motion clamp: a corrupted ICP step (e.g. dynamic
            # objects dominating correspondences) would otherwise feed an
            # unbounded velocity into the constant-velocity prediction and
            # blow the estimate up exponentially; degrade gracefully instead
            step_t = t0 - t_prev
            norm = jnp.linalg.norm(step_t)
            t0 = t_prev + step_t * jnp.minimum(1.0, cfg.max_motion / jnp.maximum(norm, 1e-9))

            # unit-cell correspondence search on the map's OWN dedup lattice
            # (one point per cell by construction -> cap 1, no code checks);
            # static span bound: pruned map <= 2*map_radius, one un-pruned
            # insert adds <= max_range reach -> single-lane u32 codes.
            # The unit-cell formulation trades one big join for a ~311-offset
            # ring of single-point cells — a win on the TPU's gather/sort
            # cost model (PERF.md r4: 0.052 -> 0.203 scans/s) but 6x SLOWER
            # on host CPU, whose sorts dominate; same results either way, so
            # the backend picks its mechanism.
            unit_cell = jax.default_backend() == "tpu"
            span_cell = cfg.map_voxel if unit_cell else cfg.max_corr_dist
            # The correspondence search indexes the map AS PRUNED BY THE LAST
            # STEP: its span is <= 2*map_radius (+ one max_motion of ego
            # drift), NOT map_radius + max_range — the scan's reach beyond
            # the pruned map matters only for the INSERT below (which keeps
            # its own wider bound).  Queries outside the index domain hit the
            # sentinel and correctly miss (no map point exists there).  The
            # tighter bound is what keeps default-scale configs single-lane:
            # at map_radius 150 m / 0.4 m cells the old
            # 2*(radius+max_range) bound needed depth 11 (3*11 > 31 -> the
            # two-lane lexsort join path, ~2x the search cost; measured
            # 515 -> ~190 ms/search on the relay chip).
            span = (2.0 * cfg.map_radius + 2.0 * cfg.max_motion) / span_cell + 8
            index_depth = max(int(np.ceil(np.log2(span))), 4)
            if 3 * index_depth > 31:
                index_depth = None  # fall back to 16-bit two-lane codes
            cell_cap = min(int(np.ceil(cfg.max_corr_dist / cfg.map_voxel) + 1) ** 3, 128)

            def run_icp(_):
                res = point_to_plane_icp(
                    scan,
                    valid,
                    vmap.points,
                    vmap.valid,
                    R0,
                    t0,
                    iters=cfg.icp_iters,
                    k=cfg.knn_k,
                    max_corr_dist=cfg.max_corr_dist,
                    huber_delta=cfg.huber_delta,
                    damping=1e-4,
                    min_planarity=cfg.min_planarity,
                    cell_cap=cell_cap,
                    index_depth=index_depth,
                    cell_size=cfg.map_voxel if unit_cell else None,
                    lattice_origin=cfg.map_origin if unit_cell else None,
                    search_every=cfg.search_every,
                )
                return res.R, res.t, res.rmse, res.inliers

            def skip_icp(_):
                return R0, t0, jnp.asarray(0.0), jnp.asarray(0, jnp.int32)

            R, t, rmse, inliers = jax.lax.cond(do_icp, run_icp, skip_icp, None)
            # reject unhealthy registrations: coast on the (clamped)
            # constant-velocity prediction instead of accepting a pose fit
            # to too few correspondences
            n_scan = jnp.maximum(jnp.sum(valid), 1)
            healthy = (~do_icp) | (inliers >= cfg.min_inlier_frac * n_scan)
            R = jnp.where(healthy, R, R0)
            t = jnp.where(healthy, t, t0)
            fuse = healthy & ((~do_icp) | (rmse < cfg.insert_rmse_gate))
            # clamp the accepted pose too (ICP can only correct within the
            # correspondence radius, so a bounded prediction keeps t bounded)
            step_t = t - t_prev
            norm = jnp.linalg.norm(step_t)
            t = t_prev + step_t * jnp.minimum(1.0, 2.0 * cfg.max_motion / jnp.maximum(norm, 1e-9))

            world = scan @ R.T + t
            # a scan registered poorly must NOT be fused into the map
            insert_valid = valid & fuse
            # merged-set span = pruned map (2*map_radius around t_prev) UNION
            # the scan's reach (2*max_range around t) — both centered within
            # max_motion of each other, so 2*max(radius, range) + slack, NOT
            # the sum.  Same depth-budget fix as the search index above: the
            # tight bound keeps default-scale configs at depth 10 and the
            # insert's dedup sort single-lane (insert() rebases to the merged
            # set's own min cell when 3*code_depth <= 31).
            map_span = (
                2.0 * max(cfg.map_radius, cfg.max_range) + 2.0 * cfg.max_motion
            ) / cfg.map_voxel + 8
            map_depth = max(int(np.ceil(np.log2(map_span))), 4)
            new_map = insert(
                vmap, world, insert_valid,
                code_depth=map_depth if 3 * map_depth <= 31 else None,
            )
            new_map = prune(new_map, t, cfg.map_radius)
            return new_map, R, t, rmse, inliers

        # lazy executable-cached jit: the odometry step is one program per
        # OdometryConfig; loading its compiled binary beats even a warm JAX
        # compilation cache by minutes on the relay backend (utils/aot_cache)
        state = {"compiled": None}

        def dispatch(*args):
            if state["compiled"] is None:
                from ..utils.aot_cache import cached_jit

                state["compiled"] = cached_jit(step, args, key_extra=repr(cfg))
            return state["compiled"](*args)

        return dispatch

    def process(self, scan: np.ndarray, labels: Optional[np.ndarray] = None) -> np.ndarray:
        """Feed one scan (N, >=3). Returns the 4x4 world_T_sensor pose."""
        pts, valid = self._preprocess(scan, labels)
        do_icp = self._frame > 0
        self.vmap, R, t, rmse, inliers = self._step(
            self.vmap,
            self._R,
            self._t,
            self._R_prev,
            self._t_prev,
            jnp.asarray(pts),
            jnp.asarray(valid),
            do_icp,
        )
        self._R_prev, self._t_prev = self._R, self._t
        self._R, self._t = R, t
        # diagnostics: registration health of the last processed scan
        self.last_rmse = float(rmse)
        self.last_inliers = int(inliers)
        self.last_scan_points = int(valid.sum())
        self._frame += 1
        pose = np.eye(4, dtype=np.float64)
        pose[:3, :3] = np.asarray(R)
        pose[:3, 3] = np.asarray(t)
        self.poses.append(pose)
        return pose

    @property
    def positions(self) -> np.ndarray:
        return np.array([p[:3, 3] for p in self.poses])
