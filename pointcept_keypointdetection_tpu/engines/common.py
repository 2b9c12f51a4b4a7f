"""Shared engine helpers (import-cycle-free home for batch assembly)."""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from ..models import PointBatch


def build_point_batch(batch: Dict[str, jnp.ndarray], num_samples: Optional[int] = None) -> PointBatch:
    """Assemble a PointBatch from a collated batch dict (jit-safe)."""
    return PointBatch(
        coord=batch["coord"],
        feat=batch["feat"],
        grid_coord=batch["grid_coord"].astype(jnp.int32),
        valid=batch["valid"],
        num_samples=num_samples if num_samples is not None else batch["num_samples"],
    )
