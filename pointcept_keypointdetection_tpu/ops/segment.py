"""Segmented reductions with static segment counts.

The TPU replacement for torch_scatter's ``segment_csr`` / ``scatter`` used
throughout the reference (PTv3 SerializedPooling, PTv2 GridPool, classifier
global pooling, ...).  All functions take a static ``num_segments`` capacity;
out-of-range segment ids (e.g. the ``num_segments`` sentinel for invalid
points) are dropped, making masking free.
"""

from __future__ import annotations

import jax.numpy as jnp

_F32_MIN = float(jnp.finfo(jnp.float32).min)
_F32_MAX = float(jnp.finfo(jnp.float32).max)


def segment_sum(data, segment_ids, num_segments: int):
    out_shape = (num_segments,) + data.shape[1:]
    return jnp.zeros(out_shape, data.dtype).at[segment_ids].add(data, mode="drop")


def segment_mean(data, segment_ids, num_segments: int):
    total = segment_sum(data, segment_ids, num_segments)
    ones = jnp.ones((data.shape[0],), data.dtype)
    count = jnp.zeros((num_segments,), data.dtype).at[segment_ids].add(ones, mode="drop")
    count = jnp.maximum(count, 1)
    return total / count.reshape((num_segments,) + (1,) * (data.ndim - 1))


def segment_max(data, segment_ids, num_segments: int):
    out_shape = (num_segments,) + data.shape[1:]
    init = jnp.full(out_shape, _F32_MIN if jnp.issubdtype(data.dtype, jnp.floating) else jnp.iinfo(data.dtype).min, data.dtype)
    out = init.at[segment_ids].max(data, mode="drop")
    # empty segments -> 0 (matches torch_scatter segment_csr on empty never occurring;
    # zeros keep padded slots harmless)
    return jnp.where(out == init, jnp.zeros_like(out), out)


def segment_min(data, segment_ids, num_segments: int):
    out_shape = (num_segments,) + data.shape[1:]
    init = jnp.full(out_shape, _F32_MAX if jnp.issubdtype(data.dtype, jnp.floating) else jnp.iinfo(data.dtype).max, data.dtype)
    out = init.at[segment_ids].min(data, mode="drop")
    return jnp.where(out == init, jnp.zeros_like(out), out)


_REDUCERS = {
    "sum": segment_sum,
    "mean": segment_mean,
    "max": segment_max,
    "min": segment_min,
}


def segment_reduce(data, segment_ids, num_segments: int, reduce: str = "sum"):
    return _REDUCERS[reduce](data, segment_ids, num_segments)
