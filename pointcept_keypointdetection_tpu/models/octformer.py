"""OctFormer — octree window attention, TPU-native.

Capability parity with `pointcept/models/octformer/octformer_v1m1_base.py`:
octree attention over fixed-size windows of contiguous octants with dilated
variants, conditional positional encoding by depthwise octree conv, octree
down/up-sampling.

TPU re-design (replacing ocnn octrees + dwconv CUDA): a sorted Morton order
IS the octree traversal — a window of K contiguous sorted points is an
octree attention window, and OctFormer's dilation-D window (every D-th
octant) is a [N/D, D] -> [D, N/D] transpose of the sorted order before
patching.  CPE uses the shared sparse-conv kernel maps (k=3 SubMConv).
Down/up-sampling reuses slotted-unique Morton pooling.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import patch_attention_xla
from ..ops.codes import code_or_batch
from ..ops.serialization import z_order_encode
from ..ops.segment import segment_mean, segment_max
from ..ops.sparse import SparseConvSpec, build_kernel_map, build_voxel_index, sparse_conv
from ..ops.voxelize import slotted_unique
from .builder import MODELS
from .norm import DropPath, LayerNorm
from .structure import PointBatch
from .sparse_unet import SubMConv

_DEPTH = 16


def _dilated_perm(order: jnp.ndarray, dilation: int) -> jnp.ndarray:
    """Regroup a sorted order so same-residue (mod D) positions are contiguous."""
    if dilation <= 1:
        return order
    n = order.shape[0]
    return order.reshape(n // dilation, dilation).T.reshape(n)


class OctreeAttention(nn.Module):
    channels: int
    num_heads: int
    patch_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, point: PointBatch, train: bool):
        c, h = self.channels, self.num_heads
        d = c // h
        order = point.serialized_order[0]
        order = _dilated_perm(order, self.dilation)
        n = point.num_points
        inverse = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))

        qkv = nn.Dense(3 * c, name="qkv")(point.feat)
        qkv_s = jnp.take(qkv, order, axis=0).reshape(-1, 3, h, d)
        valid_s = jnp.take(point.valid, order, axis=0)
        # with dilation, patches may span samples: mask cross-sample attention
        batch_s = jnp.take(point.batch, order, axis=0)
        k = self.patch_size
        p = n // k
        same_sample = batch_s.reshape(p, k)
        key_ok = valid_s.reshape(p, k)[:, None, :] & (
            same_sample[:, None, :] == same_sample[:, :, None]
        )
        # fold the cross-sample mask into validity by a per-patch majority trick:
        # use full masked attention here (small patches)
        qkv_p = qkv_s.reshape(p, k, 3, h, d)
        q = qkv_p[:, :, 0].transpose(0, 2, 1, 3)
        kk = qkv_p[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv_p[:, :, 2].transpose(0, 2, 1, 3)
        logits = jnp.einsum("phkd,phmd->phkm", q * (d**-0.5), kk, preferred_element_type=jnp.float32)
        logits = jnp.where(key_ok[:, None, :, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("phkm,phmd->phkd", attn, v, preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(n, c).astype(qkv.dtype)
        out = jnp.take(out, inverse, axis=0)
        return nn.Dense(c, name="proj")(out)


class OctFormerBlock(nn.Module):
    channels: int
    num_heads: int
    patch_size: int
    dilation: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, point: PointBatch, kmap, train: bool):
        # CPE: depthwise-ish octree conv -> SubMConv k=3
        cpe = SubMConv(self.channels, SparseConvSpec.cube(3), use_bias=True, name="cpe")(
            point.feat, kmap
        )
        feat = point.feat + cpe
        shortcut = feat
        x = LayerNorm(self.channels, name="norm1")(feat)
        x = OctreeAttention(
            self.channels, self.num_heads, self.patch_size, self.dilation, name="attn"
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


@MODELS.register_module("OctFormer-v1m1")
class OctFormer(nn.Module):
    in_channels: int = 6
    channels: Sequence[int] = (96, 192, 384, 384)
    num_blocks: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (6, 12, 24, 24)
    patch_size: int = 32
    dilation: int = 4
    drop_path_rate: float = 0.5
    slot_divisors: Sequence[int] = (1, 2, 4, 8)
    num_classes: int = 0

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False):
        num_stages = len(self.channels)
        slot0 = point.slot_size
        feat = nn.Dense(self.channels[0], name="embed")(point.feat)
        x = point.replace(feat=feat).serialize(orders=("z",), depth=_DEPTH)

        total = sum(self.num_blocks)
        blk = 0
        skips, sus = [], []
        for s in range(num_stages):
            if s > 0:
                skips.append(x)
                cap = max(slot0 // self.slot_divisors[s], self.patch_size)
                cap = -(-cap // self.patch_size) * self.patch_size
                x, su = _MortonDown(self.channels[s], name=f"down{s}")(x, cap)
                sus.append(su)
            b = x.batch
            idx = build_voxel_index(x.grid_coord, b, x.valid, _DEPTH)
            kmap = build_kernel_map(idx, x.grid_coord, b, x.valid, SparseConvSpec.cube(3), _DEPTH)
            for i in range(self.num_blocks[s]):
                x = OctFormerBlock(
                    self.channels[s], self.num_heads[s], self.patch_size,
                    dilation=1 if i % 2 == 0 else self.dilation,
                    drop_path=self.drop_path_rate * blk / max(total - 1, 1),
                    name=f"stage{s}_block{i}",
                )(x, kmap, train)
                blk += 1

        # decoder: successive unpooling with additive skips (octree upsample)
        for s in reversed(range(num_stages - 1)):
            skip = skips[s]
            feat = nn.Dense(self.channels[s], name=f"up{s}_proj")(x.feat)
            pad = jnp.concatenate([feat, jnp.zeros((1, feat.shape[1]), feat.dtype)], axis=0)
            prow = jnp.minimum(sus[s].parent_row, feat.shape[0])
            up = jnp.take(pad, prow, axis=0)
            skip_feat = nn.Dense(self.channels[s], name=f"up{s}_skip")(skip.feat)
            x = skip.replace(feat=LayerNorm(self.channels[s], name=f"up{s}_norm")(up + skip_feat))

        if self.num_classes > 0:
            return nn.Dense(self.num_classes, name="head")(x.feat)
        return x.feat


class _MortonDown(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, point: PointBatch, slot_capacity: int):
        batch = point.batch
        parent = point.grid_coord >> 1
        code = code_or_batch(z_order_encode(parent, _DEPTH), batch, _DEPTH)
        su = slotted_unique(code, point.valid, batch, point.num_samples, slot_capacity)
        m = point.num_samples * slot_capacity
        feat = nn.Dense(self.out_channels, name="proj")(point.feat)
        feat = jnp.where(point.valid[:, None], feat, -jnp.inf)
        pooled = segment_max(feat, su.parent_row, m)
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
        coord = segment_mean(point.coord * point.valid[:, None], su.parent_row, m)
        head = jnp.minimum(su.head_row, point.num_points - 1)
        grid = jnp.where(su.out_valid[:, None], jnp.take(parent, head, axis=0), 0)
        out = PointBatch(coord=coord, feat=pooled, grid_coord=grid, valid=su.out_valid,
                         num_samples=point.num_samples)
        return out.serialize(orders=("z",), depth=_DEPTH), su
