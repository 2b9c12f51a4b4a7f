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


def insert(vmap: VoxelMap, new_points: jnp.ndarray, new_valid: jnp.ndarray) -> VoxelMap:
    """Merge new (world-frame) points, one point per voxel, map points first."""
    m = vmap.capacity
    all_points = jnp.concatenate([vmap.points, new_points], axis=0)
    all_valid = jnp.concatenate([vmap.valid, new_valid], axis=0)
    grid = jnp.floor((all_points - vmap.origin) / vmap.voxel_size).astype(jnp.int32)
    in_range = jnp.all((grid >= 0) & (grid < (1 << _DEPTH)), axis=-1)
    all_valid = all_valid & in_range
    grid = jnp.clip(grid, 0, (1 << _DEPTH) - 1)

    code = z_order_encode(grid, _DEPTH)
    batch = jnp.zeros((all_points.shape[0],), jnp.int32)
    code = code_or_batch(code, batch, _DEPTH)
    su = slotted_unique(code, all_valid, batch, 1, m)
    head = jnp.minimum(su.head_row, all_points.shape[0] - 1)
    points = jnp.where(su.out_valid[:, None], jnp.take(all_points, head, axis=0), 0.0)
    return vmap._replace(points=points, valid=su.out_valid)


def prune(vmap: VoxelMap, center: jnp.ndarray, radius: float) -> VoxelMap:
    """Sliding-window eviction: drop map points farther than ``radius`` from
    ``center`` (the FAST-LIO2 local-map box-move analogue)."""
    dist = jnp.linalg.norm(vmap.points - center, axis=-1)
    return vmap._replace(valid=vmap.valid & (dist <= radius))
