"""k-nearest-neighbor / ball query / 3-NN interpolation.

The TPU replacement for the reference's CUDA ``pointops`` queries
(`libs/pointops/src/knn_query/`, `ball_query/`, `interpolation/`) used by
PTv1/PTv2 grouping, the evaluators' map-to-origin step (`engines/test.py:32-35`)
and unpooling interpolation.

Implementation: tiled brute force.  Distances are computed chunk-by-chunk with
``lax.scan`` holding a running top-k, so memory stays at ``Q x chunk`` instead
of ``Q x N``; the inner products ride the MXU.  Cross-batch matches are
excluded by adding a large penalty when batch ids differ.  This is
O(Q*N) — ample for the evaluator/grouping sizes in play; a grid-bucketed
Pallas kernel is the planned upgrade for the hot paths.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_BIG = 1e10


def knn(
    query: jnp.ndarray,  # [Q, 3]
    base: jnp.ndarray,  # [N, 3]
    k: int,
    query_batch: Optional[jnp.ndarray] = None,
    base_batch: Optional[jnp.ndarray] = None,
    base_valid: Optional[jnp.ndarray] = None,
    chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (idx int32[Q, k], sqdist f32[Q, k]) of the k nearest base points."""
    q = query.shape[0]
    n = base.shape[0]
    chunk = min(chunk, n)
    num_chunks = -(-n // chunk)
    pad_n = num_chunks * chunk

    base_p = jnp.pad(base, ((0, pad_n - n), (0, 0)))
    invalid = jnp.zeros((pad_n,), bool).at[jnp.arange(pad_n)].set(jnp.arange(pad_n) >= n)
    if base_valid is not None:
        invalid = invalid | ~jnp.pad(base_valid, (0, pad_n - n))
    bb = jnp.pad(base_batch, (0, pad_n - n)) if base_batch is not None else None

    q_sq = jnp.sum(query * query, axis=-1, keepdims=True)  # [Q,1]

    def body(carry, inputs):
        best_d, best_i = carry
        if bb is not None:
            b_chunk, bb_chunk, inv_chunk, start = inputs
        else:
            b_chunk, inv_chunk, start = inputs
            bb_chunk = None
        # squared distances [Q, chunk] via MXU inner products
        d = q_sq - 2.0 * jnp.dot(query, b_chunk.T, preferred_element_type=jnp.float32) + jnp.sum(
            b_chunk * b_chunk, axis=-1
        )[None, :]
        d = jnp.where(inv_chunk[None, :], _BIG, d)
        if bb_chunk is not None:
            d = jnp.where(query_batch[:, None] != bb_chunk[None, :], _BIG, d)
        idx = start + jax.lax.broadcasted_iota(jnp.int32, (q, b_chunk.shape[0]), 1)
        # merge with running top-k
        all_d = jnp.concatenate([best_d, d], axis=1)
        all_i = jnp.concatenate([best_i, idx], axis=1)
        neg_top, top_i = jax.lax.top_k(-all_d, k)
        return (-neg_top, jnp.take_along_axis(all_i, top_i, axis=1)), None

    init = (jnp.full((q, k), _BIG, jnp.float32), jnp.zeros((q, k), jnp.int32))
    starts = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
    chunks = base_p.reshape(num_chunks, chunk, 3)
    inv_chunks = invalid.reshape(num_chunks, chunk)
    if bb is not None:
        xs = (chunks, bb.reshape(num_chunks, chunk), inv_chunks, starts)
    else:
        xs = (chunks, inv_chunks, starts)
    (best_d, best_i), _ = jax.lax.scan(body, init, xs)
    return best_i, best_d


def ball_query(
    query: jnp.ndarray,
    base: jnp.ndarray,
    radius: float,
    k: int,
    query_batch: Optional[jnp.ndarray] = None,
    base_batch: Optional[jnp.ndarray] = None,
    base_valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k neighbors within ``radius`` (missing -> nearest-neighbor fill, matching
    pointops ball_query's repeat-first-hit semantics). Returns (idx, mask)."""
    idx, sqdist = knn(query, base, k, query_batch, base_batch, base_valid)
    within = sqdist <= radius * radius
    fill = idx[:, :1]
    idx = jnp.where(within, idx, fill)
    return idx, within


def three_nn_interpolate(
    query: jnp.ndarray,  # [Q, 3] target positions
    base: jnp.ndarray,  # [N, 3] source positions
    feat: jnp.ndarray,  # [N, C] source features
    query_batch: Optional[jnp.ndarray] = None,
    base_batch: Optional[jnp.ndarray] = None,
    base_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Inverse-distance weighted 3-NN interpolation (pointops `interpolation`)."""
    idx, sqdist = knn(query, base, 3, query_batch, base_batch, base_valid)
    inv = 1.0 / jnp.maximum(sqdist, 1e-8)
    w = inv / jnp.sum(inv, axis=-1, keepdims=True)
    gathered = jnp.take(feat, idx, axis=0)  # [Q, 3, C]
    return jnp.sum(gathered * w[..., None], axis=1)
