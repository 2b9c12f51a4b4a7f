"""Serialized patch attention (XLA path).

The TPU replacement for FlashAttention-varlen over serialized patches
(`point_transformer_v3m1_base.py:172-222`).  Because every sample occupies a
fixed slot whose size is a multiple of the patch size, attention is exactly
block-diagonal: reshape the sorted points into ``[P, K]`` patches and run
masked dense attention per patch — no cu_seqlens, no ragged kernels.

For small patches (K <= 128, the PTv3 default is 48) the whole attention
tensor is tiny and XLA fuses it well; for large patches a ``lax.map`` chunks
over patch groups to bound memory.  A Pallas fused kernel
(`ops/pallas/patch_attention.py`) covers the TPU hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def patch_attention_xla(
    qkv_sorted: jnp.ndarray,  # [N, 3, H, D] in serialized order
    valid_sorted: jnp.ndarray,  # bool[N]
    patch_size: int,
    scale: float,
    chunk_patches: int = 0,
    bias: "jnp.ndarray | None" = None,  # [P, H, K, K] additive logit bias (RPE)
) -> jnp.ndarray:
    """Masked block-diagonal attention. Returns [N, H*D] in serialized order."""
    n, three, h, d = qkv_sorted.shape
    k = patch_size
    p = n // k
    qkv = qkv_sorted.reshape(p, k, 3, h, d)
    vmask = valid_sorted.reshape(p, k)

    def attend(qkv_p, vmask_p, bias_p=None):
        # qkv_p: [pc, K, 3, H, D]; vmask_p: [pc, K]
        q = qkv_p[:, :, 0].transpose(0, 2, 1, 3)  # [pc, H, K, D]
        kk = qkv_p[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv_p[:, :, 2].transpose(0, 2, 1, 3)
        logits = jnp.einsum(
            "phkd,phmd->phkm", q * scale, kk, preferred_element_type=jnp.float32
        )
        if bias_p is not None:
            logits = logits + bias_p
        logits = jnp.where(vmask_p[:, None, None, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("phkm,phmd->phkd", attn, v, preferred_element_type=jnp.float32)
        return out.transpose(0, 2, 1, 3).reshape(qkv_p.shape[0], k, h * d).astype(qkv_p.dtype)

    if chunk_patches and p > chunk_patches and p % chunk_patches == 0:
        nc = p // chunk_patches
        operands = (
            qkv.reshape(nc, chunk_patches, k, 3, h, d),
            vmask.reshape(nc, chunk_patches, k),
        )
        if bias is not None:
            operands = operands + (bias.reshape(nc, chunk_patches, h, k, k),)
        out = jax.lax.map(lambda args: attend(*args), operands)
        out = out.reshape(n, h * d)
    else:
        out = attend(qkv, vmask, bias).reshape(n, h * d)
    return out


@jax.custom_vjp
def take_permutation(x, perm, inv_perm):
    """``x[perm]`` for a true permutation, with a gather (not scatter) VJP.

    XLA autodiff turns the transpose of a gather into a scatter-add — the
    slowest primitive on the round-1 TPU backend.  For a bijective ``perm``
    with known inverse, d/dx is exactly ``g[inv_perm]``: another gather.
    Serialized attention applies two of these per block (sort + unsort), so
    this halves its backward cost.
    """
    return jnp.take(x, perm, axis=0)


def _take_perm_fwd(x, perm, inv_perm):
    return jnp.take(x, perm, axis=0), (perm, inv_perm)


def _take_perm_bwd(res, g):
    _, inv_perm = res
    return jnp.take(g, inv_perm, axis=0), None, None


take_permutation.defvjp(_take_perm_fwd, _take_perm_bwd)
