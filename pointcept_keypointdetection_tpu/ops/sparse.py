"""Gather-scatter submanifold sparse convolution.

The TPU-native replacement for spconv's SubMConv3d / SparseConv3d /
SparseInverseConv3d (used by SpUNet `sparse_unet/spconv_unet_v1m1_base.py`,
the PTv3 stem/xCPE `point_transformer_v3m1_base.py:277-287,485-515`).

Design (sorted-code kernel maps instead of GPU hash tables):

* Active voxels carry batch-prefixed Morton codes.  A per-stage sorted code
  array + permutation is built once and cached (the analogue of spconv's
  ``indice_key`` map reuse).
* The kernel map for an offset set is a static ``int32[N, K]`` table of
  neighbor row indices (``N`` = capacity sentinel for missing neighbors),
  found by lexicographic binary search in the sorted codes.
* The convolution itself is K gather + matmul accumulations on the MXU, or a
  single im2col matmul when ``K * C_in`` is small (stem-sized kernels).

Compute cost: the matmuls are dense [N, Cin] x [Cin, Cout] — exactly MXU
shaped; no scalar loops, no dynamic shapes.
"""

from __future__ import annotations

import itertools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .codes import Code64, code_fill_invalid, code_lexsort, code_take, searchsorted_code
from .serialization import z_order_encode


class SparseConvSpec(NamedTuple):
    """Static description of a conv neighborhood."""

    offsets: Tuple[Tuple[int, int, int], ...]  # K spatial offsets

    @staticmethod
    def cube(kernel_size: int) -> "SparseConvSpec":
        """Centered k^3 neighborhood, matching spconv SubMConv3d (odd k)."""
        assert kernel_size % 2 == 1
        r = kernel_size // 2
        offs = tuple(itertools.product(range(-r, r + 1), repeat=3))
        return SparseConvSpec(offsets=offs)


class KernelMap(NamedTuple):
    neighbor_idx: jnp.ndarray  # int32[N, K]; value N = missing neighbor


class SortedVoxelIndex(NamedTuple):
    """Sorted-code lookup structure over the active voxels (cached per stage)."""

    sorted_code: Code64  # [N] ascending, invalid = CODE_MAX at the end
    perm: jnp.ndarray  # int32[N], sorted position -> voxel row


def build_voxel_index(grid_coord: jnp.ndarray, batch: jnp.ndarray, valid: jnp.ndarray, depth: int = 16) -> SortedVoxelIndex:
    """Build the sorted Morton-code index of active voxels."""
    from .codes import code_or_batch

    code = z_order_encode(grid_coord, depth)
    code = code_or_batch(code, batch, depth)
    code = code_fill_invalid(code, valid)
    perm = code_lexsort(code)
    return SortedVoxelIndex(sorted_code=code_take(code, perm), perm=perm)


def build_kernel_map(
    index: SortedVoxelIndex,
    grid_coord: jnp.ndarray,
    batch: jnp.ndarray,
    valid: jnp.ndarray,
    spec: SparseConvSpec,
    depth: int = 16,
    method: Optional[str] = None,
) -> KernelMap:
    """For each voxel and each offset, find the neighbor's row index (or N).

    ``sortmerge`` (default): Minuet-style — concatenate target and query codes,
    ONE lexsort + running-max scan recovers every query's equal-key target; no
    data-dependent gather chains (TPU gathers are the bottleneck of the
    binary-search alternative).  ``bsearch``: the log(N)-round binary search
    (kept as an oracle/fallback).
    """
    from .codes import code_or_batch

    if method is None:
        import os

        method = os.environ.get("PKT_KMAP_METHOD", "bsearch")
    n = grid_coord.shape[0]
    offs = np.asarray(spec.offsets, np.int32)  # [K, 3]
    k = offs.shape[0]

    # Symmetric-offset halving: map[i][d] = j  <=>  map[j][-d] = i, so only
    # offsets with positive lexicographic direction need searching; the
    # mirrored half is recovered by one scatter per column.  Cuts the
    # dominant search cost 2x for centered cubes.
    opposite = {}
    for ki, o in enumerate(map(tuple, offs)):
        neg = tuple(-x for x in o)
        if neg in spec.offsets:
            opposite[ki] = spec.offsets.index(neg)
    can_halve = method == "bsearch" and len(opposite) == k
    if can_halve:
        iota = jnp.arange(n, dtype=jnp.int32)
        search_cols = [
            ki for ki, o in enumerate(map(tuple, offs))
            if o > tuple(-x for x in o)  # strictly positive direction; identity excluded
        ]
        sub_spec = SparseConvSpec(offsets=tuple(tuple(offs[ki]) for ki in search_cols))
        half = build_kernel_map(index, grid_coord, batch, valid, sub_spec, depth, method="bsearch_nohalve")
        neighbor = jnp.full((n, k), n, jnp.int32)
        for slot, ki in enumerate(search_cols):
            col = half.neighbor_idx[:, slot]
            neighbor = neighbor.at[:, ki].set(col)
            # scatter transpose: where col[i] = j (hit), neighbor[j, -d] = i
            tgt = jnp.where(col < n, col, n)
            neighbor = neighbor.at[tgt, opposite[ki]].set(iota, mode="drop")
        # identity offset needs no search
        for ki, o in enumerate(map(tuple, offs)):
            if o == (0, 0, 0):
                neighbor = neighbor.at[:, ki].set(jnp.where(valid, iota, n))
        return KernelMap(neighbor_idx=neighbor)
    if method == "bsearch_nohalve":
        method = "bsearch"

    # Query codes for all (point, offset) pairs: [N*K]
    qcoord = grid_coord[:, None, :].astype(jnp.int32) + jnp.asarray(offs)[None, :, :]
    # negative coords never exist as keys (grid starts at 0); clamp to keep the
    # uint cast harmless, and kill the lookup via the validity check below.
    in_range = jnp.all(qcoord >= 0, axis=-1) & valid[:, None]
    qcode = z_order_encode(jnp.maximum(qcoord, 0).reshape(-1, 3), depth)
    qbatch = jnp.broadcast_to(batch[:, None], (n, k)).reshape(-1)
    qcode = code_or_batch(qcode, qbatch, depth)

    if method == "bsearch":
        pos = searchsorted_code(index.sorted_code, qcode, side="left")
        pos = jnp.minimum(pos, n - 1)
        found_hi = jnp.take(index.sorted_code.hi, pos, axis=0)
        found_lo = jnp.take(index.sorted_code.lo, pos, axis=0)
        hit = (found_hi == qcode.hi) & (found_lo == qcode.lo) & in_range.reshape(-1)
        row = jnp.take(index.perm, pos, axis=0)
        neighbor = jnp.where(hit, row, n).astype(jnp.int32)
        return KernelMap(neighbor_idx=neighbor.reshape(n, k))

    # ---- sort-merge path ------------------------------------------------
    # Chunk the offsets so every lexsort in the program has one of a few
    # canonical shapes (a single 13M-element variadic sort is a TPU
    # compile-time bomb; a scanned 27-offset chunk compiles once and loops).
    chunk = min(k, 27)
    nchunks = -(-k // chunk)
    pad_k = nchunks * chunk
    qhi = qcode.hi.reshape(n, k)
    qlo = qcode.lo.reshape(n, k)
    if pad_k != k:
        fill_hi = jnp.full((n, pad_k - k), 0xFFFFFFFF, jnp.uint32)
        qhi = jnp.concatenate([qhi, fill_hi], axis=1)
        qlo = jnp.concatenate([qlo, fill_hi], axis=1)
    # [nchunks, n*chunk] with query id preserved by position
    qhi_c = qhi.reshape(n, nchunks, chunk).transpose(1, 0, 2).reshape(nchunks, n * chunk)
    qlo_c = qlo.reshape(n, nchunks, chunk).transpose(1, 0, 2).reshape(nchunks, n * chunk)

    def lookup(carry, qs):
        chi, clo = qs
        rows = _sortmerge_lookup(index, chi, clo, n)
        return carry, rows

    _, rows_c = jax.lax.scan(lookup, None, (qhi_c, qlo_c))
    neighbor = rows_c.reshape(nchunks, n, chunk).transpose(1, 0, 2).reshape(n, pad_k)[:, :k]
    neighbor = jnp.where(in_range, neighbor, n).astype(jnp.int32)
    return KernelMap(neighbor_idx=neighbor)


def _sortmerge_lookup(index: SortedVoxelIndex, qhi: jnp.ndarray, qlo: jnp.ndarray, n: int) -> jnp.ndarray:
    """Find equal-key target rows for a flat query code array (n targets)."""
    nq = qhi.shape[0]
    hi = jnp.concatenate([index.sorted_code.hi, qhi])
    lo = jnp.concatenate([index.sorted_code.lo, qlo])
    # tiebreak 0 = target (sorts before equal-key queries), 1 = query
    tie = jnp.concatenate([jnp.zeros((n,), jnp.uint32), jnp.ones((nq,), jnp.uint32)])
    payload = jnp.concatenate([index.perm.astype(jnp.int32), jnp.arange(nq, dtype=jnp.int32)])

    order = jnp.lexsort((tie, lo, hi))
    s_tie = jnp.take(tie, order)
    s_hi = jnp.take(hi, order)
    s_lo = jnp.take(lo, order)
    s_payload = jnp.take(payload, order)

    is_target = s_tie == 0
    exclude_invalid = is_target & ~((s_hi == jnp.uint32(0xFFFFFFFF)) & (s_lo == jnp.uint32(0xFFFFFFFF)))

    def combine(a, b):
        fa, ra, ha, la = a
        fb, rb, hb, lb = b
        return (
            fa | fb,
            jnp.where(fb, rb, ra),
            jnp.where(fb, hb, ha),
            jnp.where(fb, lb, la),
        )

    _, run_row, run_hi, run_lo = jax.lax.associative_scan(
        combine,
        (exclude_invalid, jnp.where(exclude_invalid, s_payload, -1), s_hi, s_lo),
    )
    hit = (run_hi == s_hi) & (run_lo == s_lo) & (~is_target) & (run_row >= 0)
    result_sorted = jnp.where(hit, run_row, n).astype(jnp.int32)

    rows = jnp.full((nq,), n, jnp.int32)
    qid = jnp.where(is_target, nq, s_payload)
    return rows.at[qid].set(result_sorted, mode="drop")


def sparse_conv(
    feat: jnp.ndarray,  # [N, Cin]
    kmap: KernelMap,
    weight: jnp.ndarray,  # [K, Cin, Cout]
    bias: Optional[jnp.ndarray] = None,
    im2col_max_width: int = 2048,
) -> jnp.ndarray:
    """Apply a gather-scatter sparse convolution. Returns [N, Cout].

    Missing neighbors contribute zero (index N hits an appended zero row).
    """
    n, cin = feat.shape
    k = weight.shape[0]
    cout = weight.shape[2]
    feat_pad = jnp.concatenate([feat, jnp.zeros((1, cin), feat.dtype)], axis=0)

    if k * cin <= im2col_max_width:
        gathered = jnp.take(feat_pad, kmap.neighbor_idx, axis=0)  # [N, K, Cin]
        out = jax.lax.dot_general(
            gathered.reshape(n, k * cin),
            weight.reshape(k * cin, cout),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        def body(carry, inputs):
            idx_k, w_k = inputs
            g = jnp.take(feat_pad, idx_k, axis=0)
            return carry + jax.lax.dot_general(
                g, w_k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ), None

        init = jnp.zeros((n, cout), jnp.float32)
        out, _ = jax.lax.scan(body, init, (kmap.neighbor_idx.T, weight))
    out = out.astype(feat.dtype)
    if bias is not None:
        out = out + bias
    return out
