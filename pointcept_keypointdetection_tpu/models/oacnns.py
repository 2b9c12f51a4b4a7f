"""OA-CNNs — omni-adaptive sparse CNN, TPU-native.

Capability parity with `pointcept/models/oacnns/oacnns_v1m1_base.py`:
adaptive receptive fields via a multi-scale voxel-pooling pyramid whose
branches are fused by a learned point-wise gate, on a sparse-conv U-Net
skeleton.  spconv + torch_geometric voxel_grid become the shared sorted-code
kernel maps + slotted Morton pooling.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.codes import code_or_batch
from ..ops.segment import segment_mean
from ..ops.serialization import z_order_encode
from ..ops.sparse import SparseConvSpec, build_kernel_map, build_voxel_index, sparse_conv
from ..ops.voxelize import slotted_unique
from .builder import MODELS
from .norm import MaskedBatchNorm
from .structure import PointBatch
from .sparse_unet import BasicBlock, InverseConvUp, StridedConvDown, SubMConv

_DEPTH = 16


class AdaptiveAggregation(nn.Module):
    """Multi-scale context branches + learned gating (the OA core)."""

    channels: int
    scales: Sequence[int] = (1, 2, 4)  # voxel-coarsening factors

    @nn.compact
    def __call__(self, point: PointBatch, train: bool):
        c = self.channels
        batch = point.batch
        branches = [nn.Dense(c, name="branch_id")(point.feat)]
        for si, scale in enumerate(s for s in self.scales if s > 1):
            shift = (scale - 1).bit_length()
            parent = point.grid_coord >> shift
            code = code_or_batch(z_order_encode(parent, _DEPTH), batch, _DEPTH)
            su = slotted_unique(code, point.valid, batch, point.num_samples, point.slot_size)
            m = point.num_samples * point.slot_size
            pooled = segment_mean(point.feat * point.valid[:, None], su.parent_row, m)
            pooled = nn.Dense(c, name=f"branch_s{si}")(pooled)
            pad = jnp.concatenate([pooled, jnp.zeros((1, c), pooled.dtype)], axis=0)
            prow = jnp.minimum(su.parent_row, m)
            branches.append(jnp.take(pad, prow, axis=0))
        stack = jnp.stack(branches, axis=1)  # [N, B, C]
        gate = nn.Dense(len(branches), name="gate")(point.feat)
        gate = jax.nn.softmax(gate, axis=-1)
        out = jnp.einsum("nbc,nb->nc", stack, gate)
        out = MaskedBatchNorm(c, name="norm")(out, point.valid, not train)
        return nn.relu(out)


@MODELS.register_module("OA-CNNs")
class OACNNs(nn.Module):
    in_channels: int = 6
    num_classes: int = 0
    base_channels: int = 32
    channels: Sequence[int] = (32, 64, 128, 128)
    layers: Sequence[int] = (2, 2, 2, 2)
    slot_divisors: Sequence[int] = (1, 2, 4, 8)
    bn_momentum: float = 0.01

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False):
        num_stages = len(self.channels)
        slot0 = point.slot_size
        batch = point.batch
        idx0 = build_voxel_index(point.grid_coord, batch, point.valid, _DEPTH)
        kmap0 = build_kernel_map(idx0, point.grid_coord, batch, point.valid, SparseConvSpec.cube(3), _DEPTH)
        feat = SubMConv(self.base_channels, SparseConvSpec.cube(3), name="stem")(point.feat, kmap0)
        feat = MaskedBatchNorm(self.base_channels, momentum=self.bn_momentum, name="stem_norm")(
            feat, point.valid, not train
        )
        x = point.replace(feat=nn.relu(feat))

        skips, sus, kmaps = [], [], [kmap0]
        for s in range(num_stages):
            if s > 0:
                skips.append(x)
                cap = max(slot0 // self.slot_divisors[s], 16)
                x, su = StridedConvDown(self.channels[s], name=f"down{s}")(x, cap)
                x = x.replace(feat=nn.relu(
                    MaskedBatchNorm(self.channels[s], momentum=self.bn_momentum, name=f"down{s}_norm")(
                        x.feat, x.valid, not train
                    )
                ))
                sus.append(su)
                b = x.batch
                idx = build_voxel_index(x.grid_coord, b, x.valid, _DEPTH)
                kmaps.append(build_kernel_map(idx, x.grid_coord, b, x.valid, SparseConvSpec.cube(3), _DEPTH))
            for i in range(self.layers[s]):
                x = x.replace(feat=BasicBlock(self.channels[s], self.bn_momentum, name=f"enc{s}_block{i}")(
                    x.feat, x.valid, kmaps[s], train
                ))
            x = x.replace(feat=AdaptiveAggregation(self.channels[s], name=f"oa{s}")(x, train))

        for s in reversed(range(num_stages - 1)):
            skip = skips[s]
            up = InverseConvUp(self.channels[s], name=f"up{s}")(x.feat, skip, sus[s])
            up = nn.relu(MaskedBatchNorm(self.channels[s], momentum=self.bn_momentum, name=f"up{s}_norm")(
                up, skip.valid, not train
            ))
            x = skip.replace(feat=jnp.concatenate([up, skip.feat], axis=-1))
            x = x.replace(feat=BasicBlock(self.channels[s], self.bn_momentum, name=f"dec{s}_block")(
                x.feat, x.valid, kmaps[s], train
            ))

        if self.num_classes > 0:
            return nn.Dense(self.num_classes, name="head")(x.feat)
        return x.feat
