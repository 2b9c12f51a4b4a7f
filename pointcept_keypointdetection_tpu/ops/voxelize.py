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


def unique_with_capacity(code: Code64, valid: jnp.ndarray, capacity: int):
    """Sort + unique. Returns (perm, UniqueResult over the sorted array)."""
    from .codes import code_fill_invalid, code_lexsort

    filled = code_fill_invalid(code, valid)
    perm = code_lexsort(filled)
    sorted_code = code_take(filled, perm)
    sorted_valid = jnp.take(valid, perm, axis=0)
    return perm, sorted_code, unique_sorted_with_capacity(sorted_code, sorted_valid, capacity)
