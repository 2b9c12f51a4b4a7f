"""64-bit spatial codes as uint32 (hi, lo) pairs.

The reference keeps serialization codes in torch int64 (`pointcept/models/utils/
serialization/default.py:9-39`: ``code = batch << depth*3 | curve_code``).  On
TPU we avoid global ``jax_enable_x64`` (which would risk f64 creep into the
compute path and slow 64-bit emulation everywhere) by carrying codes as a pair
of uint32 lanes.  All the operations the framework needs — compare, shift for
pooling, lexicographic argsort, batch-prefix injection — are closed over this
representation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Code64(NamedTuple):
    """A 64-bit code split into two uint32 lanes. hi = bits 32..63, lo = bits 0..31."""

    hi: jnp.ndarray
    lo: jnp.ndarray


# Sentinel: the maximum representable code; used to push invalid/padded points
# to the end of any sorted order.
CODE_MAX = (np.uint32(0xFFFFFFFF), np.uint32(0xFFFFFFFF))


def code_from_u64(values: np.ndarray) -> Code64:
    """Split a host-side uint64 array into device (hi, lo) uint32 lanes."""
    values = np.asarray(values, dtype=np.uint64)
    return Code64(
        hi=jnp.asarray((values >> np.uint64(32)).astype(np.uint32)),
        lo=jnp.asarray((values & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
    )


def code_to_u64(code: Code64) -> np.ndarray:
    """Host-side reconstruction (for tests / debugging)."""
    hi = np.asarray(code.hi, dtype=np.uint64)
    lo = np.asarray(code.lo, dtype=np.uint64)
    return (hi << np.uint64(32)) | lo


def code_shr(code: Code64, shift: int) -> Code64:
    """Logical right shift by a static number of bits (pooling: code >> 3*depth)."""
    assert 0 <= shift < 64
    if shift == 0:
        return code
    hi = code.hi
    lo = code.lo
    if shift >= 32:
        s = shift - 32
        new_lo = hi >> s if s else hi
        new_hi = jnp.zeros_like(hi)
    else:
        new_lo = (lo >> shift) | (hi << (32 - shift))
        new_hi = hi >> shift
    return Code64(hi=new_hi, lo=new_lo)


def code_or_batch(code: Code64, batch: jnp.ndarray, depth: int) -> Code64:
    """Inject the batch index above the spatial bits: ``batch << 3*depth | code``.

    Matches `serialization/default.py:21-23`. Requires 3*depth >= 32 to land the
    batch bits purely in the hi lane (the canonical depth is 16 -> bit 48), or
    3*depth < 32 with small batch counts.
    """
    shift = 3 * depth
    batch = batch.astype(jnp.uint32)
    if shift >= 32:
        return Code64(hi=code.hi | (batch << (shift - 32)), lo=code.lo)
    # batch bits straddle/occupy the low lane
    lo = code.lo | (batch << shift)
    hi = code.hi | (batch >> (32 - shift))
    return Code64(hi=hi, lo=lo)


def code_equal(a: Code64, b: Code64) -> jnp.ndarray:
    return (a.hi == b.hi) & (a.lo == b.lo)


def code_less(a: Code64, b: Code64) -> jnp.ndarray:
    return (a.hi < b.hi) | ((a.hi == b.hi) & (a.lo < b.lo))


def code_where(pred: jnp.ndarray, a: Code64, b: Code64) -> Code64:
    return Code64(hi=jnp.where(pred, a.hi, b.hi), lo=jnp.where(pred, a.lo, b.lo))


def code_fill_invalid(code: Code64, valid: jnp.ndarray) -> Code64:
    """Set invalid entries to CODE_MAX so they sort last."""
    return Code64(
        hi=jnp.where(valid, code.hi, jnp.uint32(0xFFFFFFFF)),
        lo=jnp.where(valid, code.lo, jnp.uint32(0xFFFFFFFF)),
    )


def code_lexsort(code: Code64) -> jnp.ndarray:
    """Stable argsort of codes (ascending). Returns int32 permutation indices."""
    # jnp.lexsort sorts by the LAST key first -> primary key goes last.
    return jnp.lexsort((code.lo, code.hi)).astype(jnp.int32)


def code_take(code: Code64, idx: jnp.ndarray) -> Code64:
    return Code64(hi=jnp.take(code.hi, idx, axis=0), lo=jnp.take(code.lo, idx, axis=0))


def searchsorted_code(sorted_code: Code64, query: Code64, side: str = "left") -> jnp.ndarray:
    """Vectorized lexicographic binary search of queries in a sorted code array.

    Replaces 64-bit ``jnp.searchsorted``: a fori_loop of ``ceil(log2(N))+1``
    gather+compare rounds over all queries in parallel.  Used by the sparse-conv
    kernel-map builder (the TPU analogue of spconv's hash-based indice maps).
    """
    import jax

    n = sorted_code.hi.shape[0]
    nq = query.hi.shape[0]
    steps = max(int(np.ceil(np.log2(max(n, 1)))) + 1, 1)
    lo_b = jnp.zeros((nq,), jnp.int32)
    hi_b = jnp.full((nq,), n, jnp.int32)

    qhi, qlo = query.hi, query.lo
    shi, slo = sorted_code.hi, sorted_code.lo

    def body(_, carry):
        lo_b, hi_b = carry
        mid = (lo_b + hi_b) >> 1
        mhi = jnp.take(shi, mid, axis=0)
        mlo = jnp.take(slo, mid, axis=0)
        if side == "left":
            go_right = (mhi < qhi) | ((mhi == qhi) & (mlo < qlo))
        else:
            go_right = (mhi < qhi) | ((mhi == qhi) & (mlo <= qlo))
        new_lo = jnp.where(go_right, mid + 1, lo_b)
        new_hi = jnp.where(go_right, hi_b, mid)
        # keep bounds fixed once converged
        done = lo_b >= hi_b
        return jnp.where(done, lo_b, new_lo), jnp.where(done, hi_b, new_hi)

    lo_b, hi_b = jax.lax.fori_loop(0, steps, body, (lo_b, hi_b))
    return lo_b
