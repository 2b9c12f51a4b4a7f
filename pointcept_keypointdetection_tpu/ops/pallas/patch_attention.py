"""Pallas fused block-diagonal patch attention.

The TPU kernel replacing flash_attn_varlen over serialized patches
(`point_transformer_v3m1_base.py:208-215`).  Because patches are independent
(block-diagonal attention) and a whole patch fits VMEM, no streaming softmax
is needed: one grid step = one (patch-tile, head) computing
``softmax(q k^T * scale + mask) v`` entirely on-chip.

Patches are tiled in groups so the MXU sees [T*K, D] x [D, T*K] matmuls with
T*K >= 128 rows even for small patches (PTv3 default K=48 -> zero-padded to
the sublane tile; grouping amortizes).

Backward is a fused Pallas kernel too: probs are recomputed on-chip from
(q, k) — no [P, K, K] attention matrix ever touches HBM in either direction
(flash-attention's memory contract, trivial here because a patch fits VMEM).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..attention import patch_attention_xla


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale: float):
    # blocks: q/k/v [1, T, K, D] (T patches of this tile), mask [T, K]
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q * scale,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),  # [T, K, K]
        preferred_element_type=jnp.float32,
    )
    mask = mask_ref[:, 0, :]  # [T, K]
    logits = jnp.where(mask[:, None, :] != 0, logits, -1e9)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jax.lax.dot_general(
        probs, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    out_ref[0] = out.astype(out_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, mask_ref, g_ref, dq_ref, dk_ref, dv_ref, *, scale: float):
    # recompute probs on-chip, then the standard softmax-attention backward
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q * scale, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    mask = mask_ref[:, 0, :]
    logits = jnp.where(mask[:, None, :] != 0, logits, -1e9)
    probs = jax.nn.softmax(logits, axis=-1)  # [T, K, K]
    # dv = probs^T g
    dv = jax.lax.dot_general(
        probs, g, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # dprobs = g v^T; dlogits = probs * (dprobs - rowsum(dprobs * probs))
    dprobs = jax.lax.dot_general(
        g, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dlogits = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(
        dlogits, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dk = jax.lax.dot_general(
        dlogits, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _layout(qkv_sorted, valid_sorted, patch_size: int):
    n, three, h, d = qkv_sorted.shape
    k = patch_size
    p = n // k
    t = max(1, min(p, 512 // k if k < 512 else 1))
    while p % t != 0:
        t -= 1
    qkvh = qkv_sorted.reshape(p, k, 3, h, d).transpose(2, 3, 0, 1, 4)  # [3, H, P, K, D]
    mask = valid_sorted.reshape(p, 1, k).astype(jnp.int32)
    return qkvh, mask, (n, h, d, k, p, t)


def _pallas_backward(qkv_sorted, valid_sorted, g, patch_size: int, scale: float):
    qkvh, mask, (n, h, d, k, p, t) = _layout(qkv_sorted, valid_sorted, patch_size)
    q, kk, v = qkvh[0], qkvh[1], qkvh[2]
    gh = g.reshape(p, k, h, d).transpose(2, 0, 1, 3)  # [H, P, K, D]
    grid = (p // t, h)
    spec = pl.BlockSpec((1, t, k, d), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM)
    spec_mask = pl.BlockSpec((t, 1, k), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((h, p, k, d), qkv_sorted.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        grid=grid,
        in_specs=[spec, spec, spec, spec_mask, spec],
        out_specs=[spec, spec, spec],
        out_shape=[out_shape, out_shape, out_shape],
    )(q.reshape(h, p, k, d), kk.reshape(h, p, k, d), v.reshape(h, p, k, d), mask, gh)
    # [3 x (H, P, K, D)] -> [N, 3, H, D]
    dqkv = jnp.stack([dq, dk, dv], axis=0).transpose(2, 3, 0, 1, 4).reshape(n, 3, h, d)
    return dqkv


def _pallas_forward(qkv_sorted, valid_sorted, patch_size: int, scale: float):
    n, three, h, d = qkv_sorted.shape
    k = patch_size
    p = n // k
    # tile patches so each grid step has >= 8 sublane rows of work per matmul
    t = max(1, min(p, 512 // k if k < 512 else 1))
    while p % t != 0:
        t -= 1
    grid = (p // t, h)

    # layout: [H, P, K, D] so (tile, head) blocks are contiguous
    qkvh = qkv_sorted.reshape(p, k, 3, h, d).transpose(2, 3, 0, 1, 4)  # [3, H, P, K, D]
    q, kk, v = qkvh[0], qkvh[1], qkvh[2]
    # mask carried as [P, 1, K] so the block's trailing dims (1, K) satisfy the
    # TPU (8, 128)-divisibility rule regardless of the patch tile T
    mask = valid_sorted.reshape(p, 1, k).astype(jnp.int32)

    spec_qkv = pl.BlockSpec(
        (1, t, k, d), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM
    )
    spec_mask = pl.BlockSpec((t, 1, k), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[spec_qkv, spec_qkv, spec_qkv, spec_mask],
        out_specs=pl.BlockSpec((1, t, k, d), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, p, k, d), qkv_sorted.dtype),
    )(
        q.reshape(h, p, k, d),
        kk.reshape(h, p, k, d),
        v.reshape(h, p, k, d),
        mask,
    )
    # [H, P, K, D] -> [N, H*D]
    return out.transpose(1, 2, 0, 3).reshape(n, h * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def patch_attention_pallas(qkv_sorted, valid_sorted, patch_size: int, scale: float):
    return _pallas_forward(qkv_sorted, valid_sorted, patch_size, scale)


def _fwd(qkv_sorted, valid_sorted, patch_size, scale):
    out = _pallas_forward(qkv_sorted, valid_sorted, patch_size, scale)
    return out, (qkv_sorted, valid_sorted)


def _bwd(patch_size, scale, residuals, g):
    qkv_sorted, valid_sorted = residuals
    dqkv = _pallas_backward(qkv_sorted, valid_sorted, g, patch_size, scale)
    return dqkv, None


patch_attention_pallas.defvjp(_fwd, _bwd)
