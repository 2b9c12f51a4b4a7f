"""Swin3D — windowed sparse attention U-Net, TPU-native.

Capability parity with `pointcept/models/swin3d/` (Swin3D-v1m1): voxel-window
attention with shifted windows, contextual relative signal embedding (cRSE),
grid down-sampling, KNN-interp upsampling.

TPU re-design (replacing MinkowskiEngine sparse tensors + the external fused
Swin3D CUDA attention):
* A window of size W (power of 2) is an aligned voxel cube; because Morton
  codes sort by (window, within-window) when W = 2^k, the plain z-order
  serialization already groups windows contiguously.  Attention runs over
  fixed-size serialized patches with a same-window mask — a window larger
  than a patch is split (capacity-bounded windows, the static-shape
  trade-off), empty space costs nothing.
* Shifted windows displace the grid by W/2 before encoding (standard Swin
  shift) on alternating blocks.
* cRSE is factored: per-head relative-position bias tables over dx/dy/dz
  within the window (the reference's signal-conditioned tables add color/
  normal terms; the coordinate term implemented here is the dominant one —
  noted for round 2).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.codes import Code64, code_lexsort, code_or_batch, code_shr
from ..ops.serialization import z_order_encode
from ..ops.segment import segment_max, segment_mean
from ..ops.voxelize import slotted_unique
from ..ops.knn import three_nn_interpolate
from .builder import MODELS
from .norm import DropPath, LayerNorm, MaskedBatchNorm
from .structure import PointBatch

_DEPTH = 16


def _window_order(grid_coord, batch, valid, shift: int, depth: int = _DEPTH):
    """Serialized order grouping aligned windows; returns (order, inverse, wcode)."""
    g = grid_coord + shift
    code = code_or_batch(z_order_encode(g, depth), batch, depth)
    # invalid to end of slot: set spatial bits
    from .structure import _fill_invalid_keep_batch

    code = _fill_invalid_keep_batch(code, valid, depth)
    order = code_lexsort(code)
    n = grid_coord.shape[0]
    inverse = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return order, inverse, code


class WindowAttention(nn.Module):
    channels: int
    num_heads: int
    patch_size: int
    window_size: int  # voxels (power of two)
    shifted: bool = False

    @nn.compact
    def __call__(self, point: PointBatch, train: bool):
        c, h = self.channels, self.num_heads
        d = c // h
        k = self.patch_size
        w = self.window_size
        shift = (w // 2) if self.shifted else 0
        batch = point.batch
        order, inverse, code = _window_order(point.grid_coord, batch, point.valid, shift)

        qkv = nn.Dense(3 * c, name="qkv")(point.feat)
        qkv_s = jnp.take(qkv, order, axis=0)
        valid_s = jnp.take(point.valid, order, axis=0)
        grid_s = jnp.take(point.grid_coord + shift, order, axis=0)

        n = point.num_points
        p = n // k
        wbits = (w - 1).bit_length()
        win_code = code_shr(Code64(hi=jnp.take(code.hi, order), lo=jnp.take(code.lo, order)), 3 * wbits)

        qkv_p = qkv_s.reshape(p, k, 3, h, d)
        q = qkv_p[:, :, 0].transpose(0, 2, 1, 3)
        kk = qkv_p[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv_p[:, :, 2].transpose(0, 2, 1, 3)
        logits = jnp.einsum("phkd,phmd->phkm", q * (d**-0.5), kk, preferred_element_type=jnp.float32)

        # same-window + validity mask
        wh = win_code.hi.reshape(p, k)
        wl = win_code.lo.reshape(p, k)
        same = (wh[:, :, None] == wh[:, None, :]) & (wl[:, :, None] == wl[:, None, :])
        vmask = valid_s.reshape(p, k)
        mask = same & vmask[:, None, :]

        # factored cRSE: per-head bias tables over relative dx/dy/dz in window
        local = (grid_s & (w - 1)).reshape(p, k, 3)
        rel = local[:, :, None, :] - local[:, None, :, :] + (w - 1)  # [p, k, k, 3] in [0, 2w-2]
        table = self.param("rpe_table", nn.initializers.normal(0.02), (3, 2 * w - 1, h), jnp.float32)
        bias = (
            jnp.take(table[0], rel[..., 0], axis=0)
            + jnp.take(table[1], rel[..., 1], axis=0)
            + jnp.take(table[2], rel[..., 2], axis=0)
        )  # [p, k, k, h]
        logits = logits + bias.transpose(0, 3, 1, 2)

        logits = jnp.where(mask[:, None, :, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("phkm,phmd->phkd", attn, v, preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(n, c).astype(qkv.dtype)
        out = jnp.take(out, inverse, axis=0)
        return nn.Dense(c, name="proj")(out)


class SwinBlock(nn.Module):
    channels: int
    num_heads: int
    patch_size: int
    window_size: int
    shifted: bool
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, point: PointBatch, train: bool):
        shortcut = point.feat
        x = LayerNorm(self.channels, name="norm1")(point.feat)
        x = WindowAttention(
            self.channels, self.num_heads, self.patch_size, self.window_size, self.shifted, name="attn"
        )(point.replace(feat=x), train)
        x = DropPath(self.drop_path, name="dp1")(x, point.num_samples, not train)
        feat = shortcut + x
        shortcut = feat
        x = LayerNorm(self.channels, name="norm2")(feat)
        x = nn.Dense(int(self.channels * self.mlp_ratio), name="mlp1")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.channels, name="mlp2")(x)
        x = DropPath(self.drop_path, name="dp2")(x, point.num_samples, not train)
        return point.replace(feat=shortcut + x)


class GridDownsample(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, point: PointBatch, slot_capacity: int, train: bool):
        batch = point.batch
        parent = point.grid_coord >> 1
        code = code_or_batch(z_order_encode(parent, _DEPTH), batch, _DEPTH)
        su = slotted_unique(code, point.valid, batch, point.num_samples, slot_capacity)
        m = point.num_samples * slot_capacity
        feat = nn.Dense(self.out_channels, name="proj")(point.feat)
        feat = LayerNorm(self.out_channels, name="norm")(feat)
        feat = jnp.where(point.valid[:, None], feat, -jnp.inf)
        pooled = segment_max(feat, su.parent_row, m)
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
        coord = segment_mean(point.coord * point.valid[:, None], su.parent_row, m)
        head = jnp.minimum(su.head_row, point.num_points - 1)
        grid = jnp.where(su.out_valid[:, None], jnp.take(parent, head, axis=0), 0)
        return (
            PointBatch(coord=coord, feat=pooled, grid_coord=grid, valid=su.out_valid,
                       num_samples=point.num_samples),
            su,
        )


class KnnUpsample(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, pooled: PointBatch, skip: PointBatch, train: bool):
        c = self.out_channels
        f = nn.Dense(c, name="proj")(pooled.feat)
        interp = three_nn_interpolate(
            skip.coord, pooled.coord, f,
            query_batch=skip.batch, base_batch=pooled.batch, base_valid=pooled.valid,
        )
        sk = nn.Dense(c, name="proj_skip")(skip.feat)
        return skip.replace(feat=LayerNorm(c, name="norm")(interp + sk))


@MODELS.register_module("Swin3D-v1m1")
class Swin3DUNet(nn.Module):
    in_channels: int = 6
    depths: Sequence[int] = (2, 2, 6, 2)
    channels: Sequence[int] = (48, 96, 192, 384)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_sizes: Sequence[int] = (4, 4, 4, 4)  # voxels per window edge (pow2)
    patch_size: int = 128
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.3
    slot_divisors: Sequence[int] = (1, 2, 4, 8)
    num_classes: int = 0

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False):
        num_stages = len(self.depths)
        slot0 = point.slot_size
        feat = nn.Dense(self.channels[0], name="embed")(point.feat)
        feat = MaskedBatchNorm(self.channels[0], name="embed_norm")(feat, point.valid, not train)
        x = point.replace(feat=nn.gelu(feat))

        total = sum(self.depths)
        blk = 0
        skips, sus = [], []
        for s in range(num_stages):
            if s > 0:
                skips.append(x)
                cap = max(slot0 // self.slot_divisors[s], self.patch_size)
                cap = -(-cap // self.patch_size) * self.patch_size
                x, su = GridDownsample(self.channels[s], name=f"down{s}")(x, cap, train)
                sus.append(su)
            for i in range(self.depths[s]):
                x = SwinBlock(
                    self.channels[s], self.num_heads[s], self.patch_size,
                    self.window_sizes[s], shifted=(i % 2 == 1), mlp_ratio=self.mlp_ratio,
                    drop_path=self.drop_path_rate * blk / max(total - 1, 1),
                    name=f"stage{s}_block{i}",
                )(x, train)
                blk += 1

        for s in reversed(range(num_stages - 1)):
            x = KnnUpsample(self.channels[s], name=f"up{s}")(x, skips[s], train)
            x = SwinBlock(
                self.channels[s], self.num_heads[s], self.patch_size,
                self.window_sizes[s], shifted=False, mlp_ratio=self.mlp_ratio,
                name=f"dec{s}_block",
            )(x, train)

        if self.num_classes > 0:
            return nn.Dense(self.num_classes, name="head")(x.feat)
        return x.feat
