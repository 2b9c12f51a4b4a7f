"""Pallas fused block-diagonal patch attention.

The TPU kernel replacing flash_attn_varlen over serialized patches
(`point_transformer_v3m1_base.py:208-215`).  Because patches are independent
(block-diagonal attention) and a whole patch fits VMEM, no streaming softmax
is needed: one grid step = one (patch-tile, head) computing
``softmax(q k^T * scale + mask) v`` entirely on-chip.

Patches are tiled in groups so the MXU sees [T*K, D] x [D, T*K] matmuls with
T*K >= 128 rows even for small patches (PTv3 default K=48 -> zero-padded to
the sublane tile; grouping amortizes).

Backward currently recomputes through the XLA path via custom_vjp (correct,
and training still gets the fused forward); a fused Pallas backward is the
planned next step.
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
    _, vjp = jax.vjp(
        lambda qkv: patch_attention_xla(qkv, valid_sorted, patch_size, scale), qkv_sorted
    )
    (dqkv,) = vjp(g)
    return dqkv, None


patch_attention_pallas.defvjp(_fwd, _bwd)
