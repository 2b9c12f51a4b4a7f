"""Space-filling-curve codecs: Morton (z-order) and Hilbert.

Capability parity with `pointcept/models/utils/serialization/` — the orders
``z``, ``z-trans``, ``hilbert``, ``hilbert-trans`` with identical bit layouts:

* z-order: bit ``i`` of x -> code bit ``3i+2``, y -> ``3i+1``, z -> ``3i``
  (matches the reference's OCNN-style LUT, `z_order.py:40-50`).
* hilbert: Skilling's algorithm ("Programming the Hilbert curve", AIP 2004) —
  the reference's bit-matrix version (`hilbert.py:91-201`) is the same
  transform; parity is asserted bit-for-bit in tests/golden data.
* batch mixing: ``code = batch << 3*depth | code`` (`default.py:21-23`).

Two implementations are provided:
* ``*_np``: host-side numpy, returning uint64 (used by data pipeline + oracles).
* device codecs returning :class:`Code64` uint32 pairs (jit-safe, no x64).

The device encode is pure element-wise bit arithmetic -> XLA fuses the whole
chain into one VPU pass over the points.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .codes import Code64, code_or_batch

_ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans")


# ---------------------------------------------------------------------------
# numpy (host / oracle) codecs — uint64
# ---------------------------------------------------------------------------


def z_order_encode_np(grid_coord: np.ndarray, depth: int = 16) -> np.ndarray:
    """Morton-encode int coords (N, 3) -> uint64 keys, depth bits per axis."""
    x = grid_coord[:, 0].astype(np.uint64)
    y = grid_coord[:, 1].astype(np.uint64)
    z = grid_coord[:, 2].astype(np.uint64)
    key = np.zeros_like(x)
    for i in range(depth):
        mask = np.uint64(1 << i)
        key |= ((x & mask) << np.uint64(2 * i + 2)) | ((y & mask) << np.uint64(2 * i + 1)) | (
            (z & mask) << np.uint64(2 * i)
        )
    return key


def z_order_decode_np(key: np.ndarray, depth: int = 16) -> np.ndarray:
    key = np.asarray(key, dtype=np.uint64)
    x = np.zeros_like(key)
    y = np.zeros_like(key)
    z = np.zeros_like(key)
    for i in range(depth):
        x |= (key & np.uint64(1 << (3 * i + 2))) >> np.uint64(2 * i + 2)
        y |= (key & np.uint64(1 << (3 * i + 1))) >> np.uint64(2 * i + 1)
        z |= (key & np.uint64(1 << (3 * i))) >> np.uint64(2 * i)
    return np.stack([x, y, z], axis=-1).astype(np.int64)


def _axes_to_transpose_np(x: np.ndarray, y: np.ndarray, z: np.ndarray, depth: int):
    """Skilling's AxesToTranspose, vectorized over points (uint32 per axis)."""
    X = [x.astype(np.uint32).copy(), y.astype(np.uint32).copy(), z.astype(np.uint32).copy()]
    m = np.uint32(1 << (depth - 1))
    q = int(m)
    while q > 1:
        p = np.uint32(q - 1)
        for i in range(3):
            on = (X[i] & np.uint32(q)) != 0
            # invert low bits of X[0] where bit is on
            X[0] = np.where(on, X[0] ^ p, X[0])
            # exchange low bits of X[0] and X[i] where bit is off
            t = np.where(~on, (X[0] ^ X[i]) & p, np.uint32(0))
            X[0] ^= t
            X[i] ^= t
        q >>= 1
    # Gray encode
    for i in range(1, 3):
        X[i] ^= X[i - 1]
    t = np.zeros_like(X[0])
    q = int(m)
    while q > 1:
        on = (X[2] & np.uint32(q)) != 0
        t = np.where(on, t ^ np.uint32(q - 1), t)
        q >>= 1
    for i in range(3):
        X[i] ^= t
    return X


def _transpose_to_axes_np(X, depth: int):
    """Skilling's TransposeToAxes (inverse of the above)."""
    X = [a.astype(np.uint32).copy() for a in X]
    n = 3
    m = np.uint32(1 << (depth - 1))
    # Gray decode by H ^ (H/2)
    t = X[n - 1] >> 1
    for i in range(n - 1, 0, -1):
        X[i] ^= X[i - 1]
    X[0] ^= t
    # Undo excess work
    q = 2
    while q != (int(m) << 1):
        p = np.uint32(q - 1)
        for i in range(n - 1, -1, -1):
            on = (X[i] & np.uint32(q)) != 0
            X[0] = np.where(on, X[0] ^ p, X[0])
            t = np.where(~on, (X[0] ^ X[i]) & p, np.uint32(0))
            X[0] ^= t
            X[i] ^= t
        q <<= 1
    return X


def hilbert_encode_np(grid_coord: np.ndarray, depth: int = 16) -> np.ndarray:
    """Hilbert-encode int coords (N, 3) -> uint64 keys (3*depth bits)."""
    X = _axes_to_transpose_np(grid_coord[:, 0], grid_coord[:, 1], grid_coord[:, 2], depth)
    # interleave transpose bits: bit q of X[i] -> code bit 3q + (2 - i)
    packed = np.stack(X, axis=-1).astype(np.int64)
    return z_order_encode_np(packed, depth=depth)


def hilbert_decode_np(key: np.ndarray, depth: int = 16) -> np.ndarray:
    packed = z_order_decode_np(key, depth=depth)
    X = _transpose_to_axes_np([packed[:, 0], packed[:, 1], packed[:, 2]], depth)
    return np.stack(X, axis=-1).astype(np.int64)


def encode_np(
    grid_coord: np.ndarray, batch: Optional[np.ndarray] = None, depth: int = 16, order: str = "z"
) -> np.ndarray:
    """Full encode incl. batch prefix (host). Mirrors `serialization/default.py:9`."""
    assert order in _ORDERS
    if order == "z":
        code = z_order_encode_np(grid_coord, depth)
    elif order == "z-trans":
        code = z_order_encode_np(grid_coord[:, [1, 0, 2]], depth)
    elif order == "hilbert":
        code = hilbert_encode_np(grid_coord, depth)
    else:
        code = hilbert_encode_np(grid_coord[:, [1, 0, 2]], depth)
    if batch is not None:
        code = code | (batch.astype(np.uint64) << np.uint64(3 * depth))
    return code


# ---------------------------------------------------------------------------
# device (jnp) codecs — Code64 uint32 pairs
# ---------------------------------------------------------------------------


def _interleave3(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray, depth: int) -> Code64:
    """Morton-interleave uint32 axes into a Code64; x -> bit 3i+2, y -> 3i+1, z -> 3i."""
    lo = jnp.zeros_like(x, dtype=jnp.uint32)
    hi = jnp.zeros_like(x, dtype=jnp.uint32)
    for i in range(depth):
        for axis, off in ((x, 2), (y, 1), (z, 0)):
            p = 3 * i + off
            bit = (axis >> i) & jnp.uint32(1)
            if p < 32:
                lo = lo | (bit << p)
            else:
                hi = hi | (bit << (p - 32))
    return Code64(hi=hi, lo=lo)


def z_order_encode(grid_coord: jnp.ndarray, depth: int = 16) -> Code64:
    """Morton-encode int32 coords (N, 3) on device."""
    g = grid_coord.astype(jnp.uint32)
    return _interleave3(g[:, 0], g[:, 1], g[:, 2], depth)


def _axes_to_transpose(x, y, z, depth: int):
    """Skilling AxesToTranspose on device (uint32 lanes, static unrolled loops)."""
    X = [x.astype(jnp.uint32), y.astype(jnp.uint32), z.astype(jnp.uint32)]
    m = 1 << (depth - 1)
    q = m
    while q > 1:
        p = jnp.uint32(q - 1)
        for i in range(3):
            on = (X[i] & jnp.uint32(q)) != 0
            X[0] = jnp.where(on, X[0] ^ p, X[0])
            t = jnp.where(on, jnp.uint32(0), (X[0] ^ X[i]) & p)
            X[0] = X[0] ^ t
            X[i] = X[i] ^ t
        q >>= 1
    for i in range(1, 3):
        X[i] = X[i] ^ X[i - 1]
    t = jnp.zeros_like(X[0])
    q = m
    while q > 1:
        on = (X[2] & jnp.uint32(q)) != 0
        t = jnp.where(on, t ^ jnp.uint32(q - 1), t)
        q >>= 1
    return [a ^ t for a in X]


def hilbert_encode(grid_coord: jnp.ndarray, depth: int = 16) -> Code64:
    g = grid_coord.astype(jnp.uint32)
    X = _axes_to_transpose(g[:, 0], g[:, 1], g[:, 2], depth)
    return _interleave3(X[0], X[1], X[2], depth)


def encode(
    grid_coord: jnp.ndarray,
    batch: Optional[jnp.ndarray] = None,
    depth: int = 16,
    order: str = "z",
) -> Code64:
    """Device encode incl. batch prefix. Mirrors `serialization/default.py:9-24`."""
    assert order in _ORDERS, f"unknown order {order}"
    if order == "z":
        code = z_order_encode(grid_coord, depth)
    elif order == "z-trans":
        code = z_order_encode(grid_coord[:, jnp.array([1, 0, 2])], depth)
    elif order == "hilbert":
        code = hilbert_encode(grid_coord, depth)
    else:
        code = hilbert_encode(grid_coord[:, jnp.array([1, 0, 2])], depth)
    if batch is not None:
        code = code_or_batch(code, batch, depth)
    return code
