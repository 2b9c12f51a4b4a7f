"""SPVCNN — sparse point-voxel CNN, TPU-native.

Capability parity with `pointcept/models/spvcnn/ts_spvcnn.py` (torchsparse
backend), including the reference's dataflow (`ts_spvcnn.py:386-440`): a
point branch exchanging features with a voxel U-Net at three fusion sites —
``z1 = voxel_to_point(bottleneck) + MLP(z0)`` at the coarsest stride,
``z2 = voxel_to_point(mid-decoder) + MLP(z1)`` and
``z3 = voxel_to_point(full-res) + MLP(z2)`` — where ``voxel_to_point`` is
TRILINEAR devoxelization over the 8 surrounding stage voxels
(`ts_spvcnn.py:78-115`, torchsparse ``spdevoxelize``) and ``point_to_voxel``
is scatter-mean into the containing voxel (``spvoxelize``).

TPU re-design: stage voxels are padded slots; the 8 corner lookups reuse the
sorted-Morton kernel-map machinery (offsets {0,1}^3 against the stage's voxel
index); weights of absent corners are renormalized away (torchsparse lets
them silently shrink the feature — renormalization is the numerically kinder
choice and identical when all corners exist).  ``voxel_size`` must match the
pipeline's GridSample size; the per-sample grid anchor is recovered from
(coord - voxel_size * grid_coord).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.segment import segment_mean
from ..ops.sparse import SparseConvSpec, build_kernel_map, build_voxel_index
from .builder import MODELS
from .norm import MaskedBatchNorm
from .structure import PointBatch
from .sparse_unet import BasicBlock, InverseConvUp, StridedConvDown, SubMConv

_DEPTH = 16

_CORNERS = tuple((dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1))


def _continuous_grid(point: PointBatch, voxel_size: float) -> jnp.ndarray:
    """Continuous position in full-res voxel units, ~grid_coord + frac."""
    resid = point.coord - voxel_size * point.grid_coord.astype(jnp.float32)
    m = point.num_samples
    anchor = segment_mean(
        jnp.where(point.valid[:, None], resid, 0.0), point.batch, m
    )  # [B, 3] per-sample grid origin estimate
    cont = (point.coord - jnp.take(anchor, point.batch, axis=0)) / voxel_size
    return cont + 0.5  # voxel v covers [v, v+1); center at v + 0.5


def voxel_to_point_trilinear(
    stage: PointBatch, point: PointBatch, cont: jnp.ndarray, stride: int
) -> jnp.ndarray:
    """Trilinear devoxelize stage features onto points (`ts_spvcnn.py:78-115`)."""
    n = point.num_points
    m = stage.num_points
    # sentinel safety: build_kernel_map marks misses with the QUERY count;
    # stage capacity never exceeds the point capacity in this U-Net
    assert n >= m, (n, m)
    q = cont / float(stride)
    base = jnp.floor(q - 0.5)
    frac = q - 0.5 - base  # [N, 3] in [0, 1)
    idx = build_voxel_index(stage.grid_coord, stage.batch, stage.valid, _DEPTH)
    kmap = build_kernel_map(
        idx,
        base.astype(jnp.int32),
        point.batch,
        point.valid,
        SparseConvSpec(offsets=_CORNERS),
        _DEPTH,
    )
    rows = jnp.minimum(kmap.neighbor_idx, m)  # [N, 8], m = missing
    feat_pad = jnp.concatenate(
        [stage.feat, jnp.zeros((1, stage.feat.shape[-1]), stage.feat.dtype)], axis=0
    )
    gathered = jnp.take(feat_pad, rows, axis=0)  # [N, 8, C]
    offs = jnp.asarray(_CORNERS, jnp.float32)  # [8, 3]
    w = jnp.prod(
        offs[None] * frac[:, None, :] + (1.0 - offs[None]) * (1.0 - frac[:, None, :]),
        axis=-1,
    )  # [N, 8]
    w = jnp.where(kmap.neighbor_idx < m, w, 0.0)
    w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-8)
    return jnp.einsum("nkc,nk->nc", gathered.astype(jnp.float32), w).astype(stage.feat.dtype)


def point_to_voxel(stage: PointBatch, point: PointBatch, pfeat: jnp.ndarray, stride_log2: int):
    """Scatter-mean point features into their containing stage voxel
    (`ts_spvcnn.py:44-75`, torchsparse ``spvoxelize``)."""
    m = stage.num_points
    idx = build_voxel_index(stage.grid_coord, stage.batch, stage.valid, _DEPTH)
    kmap = build_kernel_map(
        idx,
        point.grid_coord >> stride_log2,
        point.batch,
        point.valid,
        SparseConvSpec(offsets=((0, 0, 0),)),
        _DEPTH,
    )
    rows = kmap.neighbor_idx[:, 0]  # sentinel = point count >= m
    rows = jnp.where(point.valid, rows, point.num_points)
    w = jnp.where(point.valid, 1.0, 0.0)
    pooled = segment_mean(pfeat * w[:, None], jnp.minimum(rows, m), m + 1)[:m]
    return pooled.astype(pfeat.dtype)


class PointTransform(nn.Module):
    """Point-branch residual MLP (`ts_spvcnn.py:357-383`): Linear + BN + ReLU."""

    features: int
    bn_momentum: float = 0.01

    @nn.compact
    def __call__(self, x, valid, train: bool):
        x = nn.Dense(self.features, name="fc")(x)
        x = MaskedBatchNorm(self.features, momentum=self.bn_momentum, name="norm")(
            x, valid, not train
        )
        return nn.relu(x)


@MODELS.register_module("SPVCNN")
class SPVCNN(nn.Module):
    in_channels: int = 4
    num_classes: int = 0
    base_channels: int = 32
    channels: Sequence[int] = (32, 64, 128, 96)
    layers: Sequence[int] = (2, 2, 2, 2)
    slot_divisors: Sequence[int] = (1, 2, 4, 8)
    bn_momentum: float = 0.01
    # must equal the pipeline's GridSample grid_size (torchsparse carries the
    # continuous coords; our PointBatch recovers them from coord/grid_coord)
    voxel_size: float = 0.05

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False):
        bnm = self.bn_momentum
        c0 = self.base_channels
        cont = _continuous_grid(point, self.voxel_size)

        # point branch stem (z0)
        pfeat = nn.Dense(c0, name="point_stem")(point.feat)
        pfeat = nn.relu(
            MaskedBatchNorm(c0, momentum=bnm, name="point_stem_norm")(pfeat, point.valid, not train)
        )
        z0 = pfeat

        # voxel branch: full-res stem (points are voxel-unique -> identity map)
        batch = point.batch
        idx0 = build_voxel_index(point.grid_coord, batch, point.valid, _DEPTH)
        kmap0 = build_kernel_map(idx0, point.grid_coord, batch, point.valid, SparseConvSpec.cube(3), _DEPTH)
        vfeat = SubMConv(c0, SparseConvSpec.cube(3), name="voxel_stem")(pfeat, kmap0)
        vfeat = nn.relu(MaskedBatchNorm(c0, momentum=bnm, name="voxel_stem_norm")(vfeat, point.valid, not train))
        x = point.replace(feat=vfeat)

        num_stages = len(self.channels)
        skips, sus, kmaps = [], [], [kmap0]
        slot0 = point.slot_size
        for s in range(num_stages):
            if s > 0:
                skips.append(x)
                cap = max(slot0 // self.slot_divisors[s], 16)
                x, su = StridedConvDown(self.channels[s], name=f"down{s}")(x, cap)
                x = x.replace(feat=nn.relu(
                    MaskedBatchNorm(self.channels[s], momentum=bnm, name=f"down{s}_norm")(x.feat, x.valid, not train)
                ))
                sus.append(su)
                b = x.batch
                idx = build_voxel_index(x.grid_coord, b, x.valid, _DEPTH)
                kmaps.append(build_kernel_map(idx, x.grid_coord, b, x.valid, SparseConvSpec.cube(3), _DEPTH))
            for i in range(self.layers[s]):
                x = x.replace(feat=BasicBlock(self.channels[s], bnm, name=f"enc{s}_block{i}")(
                    x.feat, x.valid, kmaps[s], train
                ))

        # fusion site 1: bottleneck -> points (`z1 = voxel_to_point(x4, z0) + pt[0](z0)`)
        s_bot = num_stages - 1
        z1 = voxel_to_point_trilinear(x, point, cont, 1 << s_bot)
        z1 = z1 + PointTransform(self.channels[s_bot], bnm, name="point_tf0")(z0, point.valid, train)
        x = x.replace(feat=point_to_voxel(x, point, z1, s_bot))

        # decoder with mid + final point fusion
        mid = max((num_stages - 1) // 2, 0)  # fuse when resolution reaches this stage
        z2 = z1
        for s in reversed(range(num_stages - 1)):
            skip = skips[s]
            up = InverseConvUp(self.channels[s], name=f"up{s}")(x.feat, skip, sus[s])
            up = nn.relu(MaskedBatchNorm(self.channels[s], momentum=bnm, name=f"up{s}_norm")(up, skip.valid, not train))
            x = skip.replace(feat=jnp.concatenate([up, skip.feat], axis=-1))
            x = x.replace(feat=BasicBlock(self.channels[s], bnm, name=f"dec{s}_block")(
                x.feat, x.valid, kmaps[s], train
            ))
            if s == mid and s > 0:
                # fusion site 2 (`z2 = voxel_to_point(y2, z1) + pt[1](z1)`)
                z2 = voxel_to_point_trilinear(x, point, cont, 1 << s)
                z2 = z2 + PointTransform(self.channels[s], bnm, name="point_tf1")(z1, point.valid, train)
                x = x.replace(feat=point_to_voxel(x, point, z2, s))

        # fusion site 3: full resolution (`z3 = voxel_to_point(y4, z2) + pt[2](z2)`)
        z3 = x.feat + PointTransform(self.channels[0], bnm, name="point_tf2")(z2, point.valid, train)
        if self.num_classes > 0:
            return nn.Dense(self.num_classes, name="head")(z3)
        return z3
