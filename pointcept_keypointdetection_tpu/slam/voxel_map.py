"""Static-capacity voxel point map.

The TPU-native replacement for FAST-LIO2's incremental ikd-tree (the external
odometry stack the reference feeds, SURVEY.md §2.9): a fixed-capacity point
store deduplicated to one point per voxel via sorted Morton codes.  All
operations are jit-safe with static shapes; eviction is
keep-first-per-voxel (existing map points win over new scan points) and
overflow drops the spatially-highest codes (callers size capacity for the
map horizon; a sliding-window recenter keeps codes bounded).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.codes import code_or_batch
from ..ops.serialization import z_order_encode
from ..ops.voxelize import slotted_unique

_DEPTH = 16


class VoxelMap(NamedTuple):
    points: jnp.ndarray  # [M, 3] world frame
    valid: jnp.ndarray  # bool[M]
    origin: jnp.ndarray  # [3] voxel-grid origin (world coords of grid 0)
    voxel_size: jnp.ndarray  # scalar

    @staticmethod
    def create(capacity: int, voxel_size: float, origin=(-500.0, -500.0, -100.0)) -> "VoxelMap":
        return VoxelMap(
            points=jnp.zeros((capacity, 3), jnp.float32),
            valid=jnp.zeros((capacity,), bool),
            origin=jnp.asarray(origin, jnp.float32),
            voxel_size=jnp.asarray(voxel_size, jnp.float32),
        )

    @property
    def capacity(self) -> int:
        return self.points.shape[0]


def insert(
    vmap: VoxelMap, new_points: jnp.ndarray, new_valid: jnp.ndarray, code_depth=None
) -> VoxelMap:
    """Merge new (world-frame) points, one point per voxel, map points first.

    ``code_depth``: caller-contracted bound on the merged set's voxel span
    (span + 4 <= 2^code_depth — for a sliding-window odometry map that is
    2*(map_radius + max_range)/voxel).  When set, voxels are rebased to the
    merged set's own min cell so the dedup sort runs on ONE u32 key instead
    of a (hi, lo) pair (the per-scan map insert is sort-bound); points beyond
    the contracted span are dropped (cannot occur within the window).
    """
    m = vmap.capacity
    all_points = jnp.concatenate([vmap.points, new_points], axis=0)
    all_valid = jnp.concatenate([vmap.valid, new_valid], axis=0)
    grid = jnp.floor((all_points - vmap.origin) / vmap.voxel_size).astype(jnp.int32)
    in_range = jnp.all((grid >= 0) & (grid < (1 << _DEPTH)), axis=-1)
    all_valid = all_valid & in_range
    grid = jnp.clip(grid, 0, (1 << _DEPTH) - 1)
    batch = jnp.zeros((all_points.shape[0],), jnp.int32)

    perm = None
    depth = _DEPTH
    if code_depth is not None and 3 * code_depth <= 31:
        depth = code_depth
        gmin = jnp.min(jnp.where(all_valid[:, None], grid, 1 << _DEPTH), axis=0)
        grid = grid - gmin
        all_valid = all_valid & jnp.all((grid >= 0) & (grid < (1 << depth)), axis=-1)
        grid = jnp.clip(grid, 0, (1 << depth) - 1)
        code = code_or_batch(z_order_encode(grid, depth), batch, depth)
        from ..ops.codes import code_fill_invalid

        filled = code_fill_invalid(code, all_valid)
        iota = jnp.arange(all_points.shape[0], dtype=jnp.int32)
        _, perm = jax.lax.sort((filled.lo, iota), num_keys=1, is_stable=True)
    else:
        code = code_or_batch(z_order_encode(grid, depth), batch, depth)
    su = slotted_unique(code, all_valid, batch, 1, m, precomputed_perm=perm)
    head = jnp.minimum(su.head_row, all_points.shape[0] - 1)
    points = jnp.where(su.out_valid[:, None], jnp.take(all_points, head, axis=0), 0.0)
    return vmap._replace(points=points, valid=su.out_valid)


def prune(vmap: VoxelMap, center: jnp.ndarray, radius: float) -> VoxelMap:
    """Sliding-window eviction: drop map points farther than ``radius`` from
    ``center`` (the FAST-LIO2 local-map box-move analogue)."""
    dist = jnp.linalg.norm(vmap.points - center, axis=-1)
    return vmap._replace(valid=vmap.valid & (dist <= radius))
