"""MinkUNet — MinkowskiEngine-style ResNet sparse U-Net (standalone).

TPU-native re-design of the reference's ME-backed family
(`pointcept/models/sparse_unet/mink_unet.py:159-460`).  Distinct from
SpUNet (`sparse_unet.py` here) in exactly the ways the reference families
differ:

* the stem is TWO stages — a k=5 submanifold conv at full resolution
  (INIT_DIM) followed by a k=2 s=2 strided conv — so all four residual
  block stages run at strides 2/4/8/16 (SpUNet's first stage runs at
  stride 1), and the final decoder stage concatenates the full-resolution
  stem features (ref `:234`);
* ``Bottleneck`` residual blocks (1x1 -> 3x3 -> 1x1, expansion 4; ref
  `:95-156`) power the deep variants (MinkUNet50/101);
* the published PLANES/LAYERS plans for 14/18/34/50/101 and the A/B/C/D
  width letters are reproduced verbatim (ref `:366-460`).

Compute path: kernel-map gather convs (`ops/sparse.sparse_conv`) for all
k=3/k=5 submanifold convs, octant-partitioned strided down/up convs
(`sparse_unet.StridedConvDown/InverseConvUp`) — all MXU contractions over
static-slot PointBatches; no MinkowskiEngine hash maps.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.sparse import SparseConvSpec, build_kernel_map, build_voxel_index
from .builder import MODELS
from .sparse_unet import (
    BasicBlock,
    InverseConvUp,
    StridedConvDown,
    SubMConv,
    _make_norm,
    _trunc_normal,
)
from .structure import PointBatch

_DEPTH = 16


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1(x4) residual block (ref mink_unet.py:95-156)."""

    planes: int
    expansion: int = 4
    bn_momentum: float = 0.01

    @nn.compact
    def __call__(self, feat, valid, kmap, train: bool):
        out_ch = self.planes * self.expansion
        norm = lambda ch, name: _make_norm(ch, self.bn_momentum, 0, name)
        identity = feat
        out = nn.Dense(self.planes, use_bias=False, kernel_init=_trunc_normal(0.02), name="conv1")(feat)
        out = norm(self.planes, "norm1")(out, valid, None, train)
        out = nn.relu(out)
        out = SubMConv(self.planes, SparseConvSpec.cube(3), name="conv2")(out, kmap)
        out = norm(self.planes, "norm2")(out, valid, None, train)
        out = nn.relu(out)
        out = nn.Dense(out_ch, use_bias=False, kernel_init=_trunc_normal(0.02), name="conv3")(out)
        out = norm(out_ch, "norm3")(out, valid, None, train)
        if feat.shape[-1] != out_ch:
            identity = nn.Dense(out_ch, use_bias=False, kernel_init=_trunc_normal(0.02), name="proj")(identity)
            identity = norm(out_ch, "norm_proj")(identity, valid, None, train)
        return nn.relu(out + identity)


class MinkUNet(nn.Module):
    """MinkUNetBase forward (ref mink_unet.py:159-364) over a PointBatch."""

    in_channels: int
    num_classes: int
    planes: Sequence[int] = (32, 64, 128, 256, 256, 128, 96, 96)
    layers: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2)
    block: str = "basic"  # "basic" (expansion 1) | "bottleneck" (expansion 4)
    init_dim: int = 32
    bn_momentum: float = 0.01
    slot_divisors: Sequence[int] = (2, 4, 8, 16)

    def _block(self, ch):
        if self.block == "bottleneck":
            return Bottleneck(ch, bn_momentum=self.bn_momentum)
        return BasicBlock(ch, self.bn_momentum)

    @property
    def expansion(self) -> int:
        return 4 if self.block == "bottleneck" else 1

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False, condition=None):
        bnm = self.bn_momentum
        slot0 = point.slot_size

        def kmap3(pb):
            idx = build_voxel_index(pb.grid_coord, pb.batch, pb.valid, _DEPTH)
            return build_kernel_map(
                idx, pb.grid_coord, pb.batch, pb.valid, SparseConvSpec.cube(3), _DEPTH
            )

        # conv0p1s1 (k=5) + bn0 + relu — full-resolution stem kept as the
        # final decoder stage's skip (ref :234, :255-261)
        idx0 = build_voxel_index(point.grid_coord, point.batch, point.valid, _DEPTH)
        kmap_stem = build_kernel_map(
            idx0, point.grid_coord, point.batch, point.valid, SparseConvSpec.cube(5), _DEPTH
        )
        feat = SubMConv(self.init_dim, SparseConvSpec.cube(5), name="conv0")(point.feat, kmap_stem)
        feat = _make_norm(self.init_dim, bnm, 0, "bn0")(feat, point.valid, None, train)
        stem = point.replace(feat=nn.relu(feat))

        # 4 encoder stages at strides 2/4/8/16: convNp*s2 + bn + relu + blocks
        skips = [stem]
        sus = []
        kmaps = []
        x = stem
        exp = self.expansion
        for s in range(4):
            cap = max(slot0 // self.slot_divisors[s], 1)
            down_ch = self.init_dim if s == 0 else self.planes[s - 1] * exp
            pooled, su = StridedConvDown(down_ch, name=f"conv{s + 1}s2")(x, cap)
            f = _make_norm(down_ch, bnm, 0, f"bn{s + 1}")(pooled.feat, pooled.valid, None, train)
            pooled = pooled.replace(feat=nn.relu(f))
            kmap = kmap3(pooled)
            for i in range(self.layers[s]):
                pooled = pooled.replace(
                    feat=self._block(self.planes[s]).copy(name=f"block{s + 1}_{i}")(
                        pooled.feat, pooled.valid, kmap, train
                    )
                )
            skips.append(pooled)
            sus.append(su)
            kmaps.append(kmap)
            x = pooled

        # 4 decoder stages: convtr k=2 s=2 + bn + relu, concat skip, blocks
        for d in range(4):
            s = 3 - d  # level being restored (3 -> stride 8 ... 0 -> stride 1)
            tr_ch = self.planes[4 + d]
            skip = skips[s]  # skips[0] is the full-res stem
            up = InverseConvUp(tr_ch, name=f"convtr{4 + d}")(x.feat, skip, sus[s])
            up = _make_norm(tr_ch, bnm, 0, f"bntr{4 + d}")(up, skip.valid, None, train)
            up = nn.relu(up)
            x = skip.replace(feat=jnp.concatenate([up, skip.feat], axis=-1))
            kmap = kmaps[s - 1] if s > 0 else kmap3(stem)
            for i in range(self.layers[4 + d]):
                x = x.replace(
                    feat=self._block(tr_ch).copy(name=f"block{5 + d}_{i}")(
                        x.feat, x.valid, kmap, train
                    )
                )

        if self.num_classes > 0:
            return nn.Dense(self.num_classes, kernel_init=_trunc_normal(0.02), name="final")(x.feat)
        return x.feat


def _variant(name, layers, block, planes=(32, 64, 128, 256, 256, 128, 96, 96)):
    @MODELS.register_module(name)
    def factory(**kwargs):
        kwargs.setdefault("layers", layers)
        kwargs.setdefault("planes", planes)
        kwargs.setdefault("block", block)
        return MinkUNet(**kwargs)

    factory.__name__ = name
    return factory


# ref mink_unet.py:366-460 — the published plans
_variant("MinkUNet14", (1,) * 8, "basic")
_variant("MinkUNet18", (2,) * 8, "basic")
_variant("MinkUNet34", (2, 3, 4, 6, 2, 2, 2, 2), "basic")
_variant("MinkUNet50", (2, 3, 4, 6, 2, 2, 2, 2), "bottleneck")
_variant("MinkUNet101", (2, 3, 4, 23, 2, 2, 2, 2), "bottleneck")
_variant("MinkUNet14A", (1,) * 8, "basic", (32, 64, 128, 256, 128, 128, 96, 96))
_variant("MinkUNet14B", (1,) * 8, "basic", (32, 64, 128, 256, 128, 128, 128, 128))
_variant("MinkUNet14C", (1,) * 8, "basic", (32, 64, 128, 256, 192, 192, 128, 128))
_variant("MinkUNet14D", (1,) * 8, "basic", (32, 64, 128, 256, 384, 384, 384, 384))
_variant("MinkUNet18A", (2,) * 8, "basic", (32, 64, 128, 256, 128, 128, 96, 96))
_variant("MinkUNet18B", (2,) * 8, "basic", (32, 64, 128, 256, 128, 128, 128, 128))
_variant("MinkUNet18D", (2,) * 8, "basic", (32, 64, 128, 256, 384, 384, 384, 384))
_variant("MinkUNet34A", (2, 3, 4, 6, 2, 2, 2, 2), "basic", (32, 64, 128, 256, 256, 128, 96, 96))
_variant("MinkUNet34B", (2, 3, 4, 6, 2, 2, 2, 2), "basic", (32, 64, 128, 256, 256, 128, 64, 32))
_variant("MinkUNet34C", (2, 3, 4, 6, 2, 2, 2, 2), "basic", (32, 64, 128, 256, 256, 128, 96, 96))
