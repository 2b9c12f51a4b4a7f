"""Static-shape voxel unique / clustering.

The TPU analogue of ``torch.unique(..., return_inverse=True)`` used by
SerializedPooling (`point_transformer_v3m1_base.py:385-398`) and of GridSample's
hash-unique.  Because XLA requires static shapes, uniques are compacted into a
fixed ``capacity`` with a validity mask; the (dynamic) number of uniques is
returned as a traced scalar for masking, and overflow beyond capacity is
dropped (callers size capacity so this never happens in practice and can
monitor ``num_unique`` against it).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .codes import Code64, code_take


class UniqueResult(NamedTuple):
    # per input element
    segment_ids: jnp.ndarray  # int32[N]; capacity sentinel (=capacity) if input invalid or overflow
    # per unique slot
    head_index: jnp.ndarray  # int32[M]; index of first (sorted) input of the segment; N if slot empty
    out_valid: jnp.ndarray  # bool[M]
    num_unique: jnp.ndarray  # int32 scalar (may exceed M if overflow)


def unique_sorted_with_capacity(sorted_code: Code64, valid: jnp.ndarray, capacity: int) -> UniqueResult:
    """Unique over an already-sorted code array (invalids sorted last).

    ``sorted_code`` must be ascending with all invalid entries at positions
    where ``valid`` is False (their codes are CODE_MAX).
    """
    n = sorted_code.hi.shape[0]
    prev_hi = jnp.concatenate([sorted_code.hi[:1] ^ jnp.uint32(1), sorted_code.hi[:-1]])
    prev_lo = jnp.concatenate([sorted_code.lo[:1], sorted_code.lo[:-1]])
    is_head = valid & ((sorted_code.hi != prev_hi) | (sorted_code.lo != prev_lo))
    seg = jnp.cumsum(is_head.astype(jnp.int32)) - 1  # -1 before first head only if first invalid
    num_unique = jnp.where(n > 0, seg[-1] + 1, 0).astype(jnp.int32)
    seg = jnp.where(valid & (seg >= 0) & (seg < capacity), seg, capacity).astype(jnp.int32)

    positions = jnp.arange(n, dtype=jnp.int32)
    scatter_tgt = jnp.where(is_head & (seg < capacity), seg, capacity)
    head_index = jnp.full((capacity,), n, jnp.int32).at[scatter_tgt].set(positions, mode="drop")
    out_valid = head_index < n
    return UniqueResult(segment_ids=seg, head_index=head_index, out_valid=out_valid, num_unique=num_unique)


class SlottedUniqueResult(NamedTuple):
    """Unique voxels compacted into per-sample slots of fixed capacity."""

    # per input row (original layout)
    parent_row: jnp.ndarray  # int32[N]; output row of this point's unique voxel; B*S_out if dropped/invalid
    # per output row (slotted layout, size B*S_out)
    head_row: jnp.ndarray  # int32[B*S_out]; input row of the segment head; N if slot empty
    out_valid: jnp.ndarray  # bool[B*S_out]
    counts: jnp.ndarray  # int32[B*S_out]; number of input points per unique voxel
    num_unique: jnp.ndarray  # int32 scalar (incl. any overflow beyond per-slot capacity)


def slotted_unique(
    code: Code64,
    valid: jnp.ndarray,
    batch: jnp.ndarray,
    num_samples: int,
    slot_capacity: int,
    precomputed_perm=None,
) -> SlottedUniqueResult:
    """Unique codes compacted into ``num_samples`` slots of ``slot_capacity``.

    ``code`` must already carry the batch prefix in its high bits (so sorting
    groups samples).  Uniques of sample ``b`` land at rows
    ``[b*slot_capacity, ...)`` in ascending code order; per-sample overflow
    beyond ``slot_capacity`` is dropped (callers monitor ``num_unique``).

    ``precomputed_perm``: a batch-major argsort of (a refinement of) the
    codes — e.g. the serialization's z-order argsort when ``code`` is the
    coarsened ``grid >> k`` (coarse z-codes are bit-prefixes of fine ones,
    so fine order IS coarse order with stable ties).  The reused perm may
    interleave invalid runs at batch boundaries instead of globally last;
    head detection only needs equal-code runs contiguous and invalids
    non-head, both of which hold.

    This is the engine under SerializedPooling
    (`point_transformer_v3m1_base.py:385-414`) and strided sparse conv.
    """
    from .codes import code_fill_invalid, code_lexsort

    n = code.hi.shape[0]
    filled = code_fill_invalid(code, valid)
    perm = precomputed_perm if precomputed_perm is not None else code_lexsort(filled)
    sorted_code = code_take(filled, perm)
    sorted_valid = jnp.take(valid, perm, axis=0)
    res = unique_sorted_with_capacity(sorted_code, sorted_valid, capacity=n)
    seg = res.segment_ids  # int32[N] in [0, n], sorted layout

    m = num_samples * slot_capacity
    # batch id of each global unique (via its head input row)
    head_in_sorted = res.head_index  # int32[n]; n = empty
    head_batch = jnp.where(
        head_in_sorted < n,
        jnp.take(batch, jnp.take(perm, jnp.minimum(head_in_sorted, n - 1), axis=0), axis=0),
        num_samples,
    )
    # first global-unique id of each sample
    gids = jnp.arange(n, dtype=jnp.int32)
    base = jnp.full((num_samples,), n, jnp.int32).at[head_batch].min(gids, mode="drop")
    rank = gids - jnp.take(base, jnp.minimum(head_batch, num_samples - 1), axis=0)
    slot_ok = (head_in_sorted < n) & (rank >= 0) & (rank < slot_capacity)
    out_row_of_unique = jnp.where(slot_ok, head_batch * slot_capacity + rank, m).astype(jnp.int32)

    # per-input mapping (original layout)
    parent_sorted = jnp.take(out_row_of_unique, jnp.minimum(seg, n - 1), axis=0)
    parent_sorted = jnp.where(seg < n, parent_sorted, m)
    parent_row = jnp.zeros((n,), jnp.int32).at[perm].set(parent_sorted)

    # per-output info
    head_row = jnp.full((m,), n, jnp.int32).at[out_row_of_unique].set(
        jnp.take(perm, jnp.minimum(head_in_sorted, n - 1), axis=0), mode="drop"
    )
    out_valid = head_row < n
    ones = jnp.ones((n,), jnp.int32) * valid.astype(jnp.int32)
    counts = jnp.zeros((m,), jnp.int32).at[parent_row].add(ones, mode="drop")
    return SlottedUniqueResult(
        parent_row=parent_row,
        head_row=head_row,
        out_valid=out_valid,
        counts=counts,
        num_unique=res.num_unique,
    )


def unique_with_capacity(code: Code64, valid: jnp.ndarray, capacity: int):
    """Sort + unique. Returns (perm, UniqueResult over the sorted array)."""
    from .codes import code_fill_invalid, code_lexsort

    filled = code_fill_invalid(code, valid)
    perm = code_lexsort(filled)
    sorted_code = code_take(filled, perm)
    sorted_valid = jnp.take(valid, perm, axis=0)
    return perm, sorted_code, unique_sorted_with_capacity(sorted_code, sorted_valid, capacity)
