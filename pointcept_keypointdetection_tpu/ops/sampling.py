"""Farthest point sampling.

The TPU replacement for pointops' CUDA FPS
(`libs/pointops/src/sampling/sampling_cuda_kernel.cu`), used by PTv1's
downsampling.  A ``fori_loop`` of argmax-over-min-distance rounds; each round
is one fused VPU pass over N points — O(S*N) total, static shapes throughout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def farthest_point_sampling(
    coord: jnp.ndarray,  # [N, 3]
    num_samples: int,
    valid: Optional[jnp.ndarray] = None,
    start_idx: int = 0,
) -> jnp.ndarray:
    """Returns int32[num_samples] indices. Invalid points are never selected
    (if fewer valid points than samples, the farthest valid repeats)."""
    n = coord.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    penalty = jnp.where(valid, 0.0, -jnp.inf)

    def body(i, carry):
        min_d, selected = carry
        last = selected[i - 1]
        d = jnp.sum((coord - coord[last]) ** 2, axis=-1)
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d + penalty).astype(jnp.int32)
        return min_d, selected.at[i].set(nxt)

    selected = jnp.zeros((num_samples,), jnp.int32).at[0].set(start_idx)
    min_d = jnp.full((n,), jnp.inf)
    _, selected = jax.lax.fori_loop(1, num_samples, body, (min_d, selected))
    return selected
