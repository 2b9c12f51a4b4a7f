"""Pallas fused gather+matmul submanifold sparse convolution.

The TPU kernel replacing the XLA gather -> im2col -> matmul pipeline of
``ops.sparse._conv_apply`` (the spconv SubMConv3d analogue; reference
``spconv.SubMConv3d`` call sites at
``pointcept/models/point_transformer_v3/point_transformer_v3m1_base.py:277-287``).

Why fuse: XLA cannot fuse a gather into a dot, so the XLA path materializes
the [N, K*C] im2col matrix to HBM — at N=102k, K=27, C=32 bf16 that is
~177 MB of HBM traffic per conv, ~25x the size of the feature table it was
gathered from.  Here the feature table (plus its appended zero row — the
missing-neighbor sentinel) stays resident in VMEM across the whole grid;
each grid step loads one [T, K] tile of neighbor indices from SMEM, gathers
the K neighbor rows per point with dynamic sublane loads, and accumulates
``sum_k rows_k @ W[k]`` in an f32 VMEM accumulator.  HBM traffic is one read
of feat + idx and one write of out — the speed-of-light for this op.

Mosaic constraints (probed on the chip):
* vector gathers (``jnp.take`` by a traced index vector) do not lower for
  TPU; scalar-indexed dynamic row slices do.  The gather is therefore a
  ``fori_loop`` of [1, C] row loads — VMEM-latency, not HBM-latency,
  because the table is resident.
* single-row dynamic slices compile only for 32-bit element types (bf16's
  2-per-word sublane packing rejects them), so the kernel computes in f32
  internally: the table is cast at entry and the VMEM-fit gate prices the
  table at 4 bytes/element.

Exactness: bit-identical inputs to the XLA path (same f32 accumulate, same
zero-row sentinel semantics); tested in ``tests/test_pallas_conv.py`` both
in interpreter mode and against the XLA conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_rows(k: int) -> int:
    # SMEM holds the [T, K] index tile; keep it ~<=16 KB of int32
    t = max(4096 // max(k, 1), 1)  # clamp: k>4096 would make t=0 (1<<-1)
    t = 1 << (t.bit_length() - 1)
    return max(8, min(256, t))


def _conv_kernel(idx_ref, feat_ref, w_ref, out_ref, gath_ref, acc_ref, *, tile, k, cin):
    """One grid step: out[tile] = sum_k feat[idx[tile, k]] @ w[k]."""
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def offset_body(d, _):
        def row_body(t, _):
            r = idx_ref[t, d]
            gath_ref[pl.ds(t, 1), :] = feat_ref[pl.ds(r, 1), :]
            return 0

        jax.lax.fori_loop(0, tile, row_body, 0)
        acc_ref[:] += jax.lax.dot_general(
            gath_ref[:],
            w_ref[d],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, k, offset_body, 0)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_subm_conv(
    feat: jnp.ndarray,  # [N, Cin] — WITHOUT the zero sentinel row
    neighbor_idx: jnp.ndarray,  # [N, K] int32 in [0, N]; N == missing
    weight: jnp.ndarray,  # [K, Cin, Cout]
    interpret: bool = False,
) -> jnp.ndarray:
    """out[i] = sum_d feat_pad[neighbor_idx[i, d]] @ weight[d]; [N, Cout]."""
    n, cin = feat.shape
    k, _, cout = weight.shape
    tile = _tile_rows(k)
    n_pad = -(-n // tile) * tile
    feat_tab = jnp.concatenate(
        [feat.astype(jnp.float32), jnp.zeros((1, cin), jnp.float32)], axis=0
    )
    idx = neighbor_idx
    if n_pad != n:
        idx = jnp.concatenate(
            [idx, jnp.full((n_pad - n, k), n, jnp.int32)], axis=0
        )
    w = weight.astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_conv_kernel, tile=tile, k=k, cin=cin),
        out_shape=jax.ShapeDtypeStruct((n_pad, cout), feat.dtype),
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, k), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # feat table, resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weight, resident
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile, cin), jnp.float32),  # gathered rows for one offset
            pltpu.VMEM((tile, cout), jnp.float32),  # accumulator
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=15 * 1024 * 1024),
        interpret=interpret,
    )(idx, feat_tab, w)
    return out[:n] if n_pad != n else out


def _dw_kernel(idx_ref, feat_ref, g_ref, dw_ref, gath_ref, *, tile, k):
    """Accumulate dW[k] += gathered_k^T @ g over row tiles (sequential grid)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    def offset_body(d, _):
        def row_body(t, _):
            r = idx_ref[t, d]
            gath_ref[pl.ds(t, 1), :] = feat_ref[pl.ds(r, 1), :]
            return 0

        jax.lax.fori_loop(0, tile, row_body, 0)
        dw_ref[d] += jax.lax.dot_general(
            gath_ref[:],
            g_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),  # [Cin, Cout]
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, k, offset_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_subm_conv_dw(
    feat: jnp.ndarray,  # [N, Cin]
    neighbor_idx: jnp.ndarray,  # [N, K]
    grad_out: jnp.ndarray,  # [N, Cout]
    interpret: bool = False,
) -> jnp.ndarray:
    """dW[d] = sum_i feat_pad[neighbor_idx[i, d]]^T grad_out[i]; [K, Cin, Cout] f32."""
    n, cin = feat.shape
    k = neighbor_idx.shape[1]
    cout = grad_out.shape[1]
    tile = _tile_rows(k)
    n_pad = -(-n // tile) * tile
    feat_tab = jnp.concatenate(
        [feat.astype(jnp.float32), jnp.zeros((1, cin), jnp.float32)], axis=0
    )
    idx = neighbor_idx
    g = grad_out.astype(jnp.float32)
    if n_pad != n:
        idx = jnp.concatenate([idx, jnp.full((n_pad - n, k), n, jnp.int32)], axis=0)
        g = jnp.concatenate([g, jnp.zeros((n_pad - n, cout), g.dtype)], axis=0)

    dw = pl.pallas_call(
        functools.partial(_dw_kernel, tile=tile, k=k),
        out_shape=jax.ShapeDtypeStruct((k, cin, cout), jnp.float32),
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, k), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, cout), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # revisited every step
        scratch_shapes=[pltpu.VMEM((tile, cin), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=15 * 1024 * 1024),
        interpret=interpret,
    )(idx, feat_tab, g)
    return dw
