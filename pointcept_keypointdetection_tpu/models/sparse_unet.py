"""SpUNet — submanifold sparse-conv U-Net (MinkUNet topology), TPU-native.

Capability parity with `pointcept/models/sparse_unet/spconv_unet_v1m1_base.py`
(SpUNet-v1m1): stem SubMConv (k=5) -> 4 encoder stages (strided conv k=2 s=2 +
BasicBlock residuals) -> 4 decoder stages (inverse conv + skip concat +
BasicBlocks) -> linear head.  Channels/layers defaults match the reference
(`spconv_unet_v1m1_base.py:92-99`).

TPU re-design: spconv hash kernel-maps become sorted-Morton-code binary-search
maps (`ops/sparse.py`), built once per stage and shared by every block in the
stage (the ``indice_key`` analogue); strided down/up-sampling uses
``slotted_unique`` so every stage keeps static per-sample capacities; all
matmuls are dense MXU-shaped gathers.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.codes import code_or_batch
from ..ops.segment import segment_mean, segment_sum
from ..ops.serialization import z_order_encode
from ..ops.sparse import SparseConvSpec, build_kernel_map, build_voxel_index, sparse_conv
from ..ops.voxelize import slotted_unique
from .builder import MODELS
from .norm import MaskedBatchNorm
from .structure import PointBatch

_DEPTH = 16  # bits per axis in voxel codes


def _trunc_normal(std):
    return nn.initializers.truncated_normal(stddev=std, lower=-2 * std, upper=2 * std)


def _make_norm(features, bn_momentum, num_conditions, name=None):
    """Norm factory: MaskedBatchNorm, or PDNorm when ``num_conditions`` > 0
    (the SpUNet-v1m3 PDNorm wiring, `spconv_unet_v1m3_pdnorm.py`).  Returns a
    uniform callable (feat, valid, cond, train) -> feat."""
    if num_conditions:
        from .point_prompt_training import PDNorm

        pd = PDNorm(features, num_conditions, momentum=bn_momentum, name=name)
        return lambda feat, valid, cond, train: pd(
            feat, valid, cond, use_running_average=not train
        )
    mbn = MaskedBatchNorm(features, momentum=bn_momentum, name=name)
    return lambda feat, valid, cond, train: mbn(feat, valid, not train)


class SubMConv(nn.Module):
    """Submanifold sparse conv via a precomputed kernel map."""

    features: int
    spec: SparseConvSpec
    use_bias: bool = False

    @nn.compact
    def __call__(self, feat, kmap):
        k = len(self.spec.offsets)
        cin = feat.shape[-1]
        weight = self.param("weight", _trunc_normal(0.02), (k, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32) if self.use_bias else None
        return sparse_conv(feat, kmap, weight, bias)


class BasicBlock(nn.Module):
    """Residual block: conv3-bn-relu-conv3-bn + proj(skip), relu.

    Mirrors the reference BasicBlock (`spconv_unet_v1m1_base.py:23-86`) incl.
    the 1x1-conv+BN projection shortcut when in/out widths differ.
    """

    features: int
    bn_momentum: float = 0.01
    num_conditions: int = 0  # >0: PDNorm instead of BatchNorm (v1m3)

    @nn.compact
    def __call__(self, feat, valid, kmap, train: bool, cond=None):
        norm = lambda name: _make_norm(self.features, self.bn_momentum, self.num_conditions, name)
        identity = feat
        out = SubMConv(self.features, SparseConvSpec.cube(3))(feat, kmap)
        out = norm("norm1")(out, valid, cond, train)
        out = nn.relu(out)
        out = SubMConv(self.features, SparseConvSpec.cube(3))(out, kmap)
        out = norm("norm2")(out, valid, cond, train)
        if feat.shape[-1] != self.features:
            identity = nn.Dense(self.features, use_bias=False, kernel_init=_trunc_normal(0.02))(identity)
            identity = norm("norm_proj")(identity, valid, cond, train)
        out = nn.relu(out + identity)
        return out


def _child_offset_id(grid_coord):
    """Which of the 8 octant offsets a voxel occupies inside its stride-2 parent."""
    bits = grid_coord & 1
    return (bits[:, 0] << 2) | (bits[:, 1] << 1) | bits[:, 2]


class StridedConvDown(nn.Module):
    """SparseConv3d(kernel=2, stride=2): children scatter into parent voxels."""

    features: int

    @nn.compact
    def __call__(self, point: PointBatch, slot_capacity: int):
        n, cin = point.feat.shape
        weight = self.param("weight", _trunc_normal(0.02), (8, cin, self.features), jnp.float32)

        parent_grid = point.grid_coord >> 1
        batch = point.batch
        code = code_or_batch(z_order_encode(parent_grid, _DEPTH), batch, _DEPTH)
        su = slotted_unique(code, point.valid, batch, point.num_samples, slot_capacity)
        m = point.num_samples * slot_capacity

        off = _child_offset_id(point.grid_coord)
        transformed = jnp.zeros((n, self.features), jnp.float32)
        for k in range(8):
            sel = ((off == k) & point.valid)[:, None]
            contrib = jax.lax.dot_general(
                point.feat, weight[k], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            transformed = transformed + jnp.where(sel, contrib, 0.0)
        out_feat = segment_sum(transformed, su.parent_row, m).astype(point.feat.dtype)
        out_coord = segment_mean(point.coord * point.valid[:, None], su.parent_row, m)

        head = jnp.minimum(su.head_row, n - 1)
        out_grid = jnp.where(su.out_valid[:, None], jnp.take(parent_grid, head, axis=0), 0)
        pooled = PointBatch(
            coord=out_coord,
            feat=out_feat,
            grid_coord=out_grid,
            valid=su.out_valid,
            num_samples=point.num_samples,
        )
        return pooled, su


class InverseConvUp(nn.Module):
    """SparseInverseConv3d(kernel=2): parents broadcast back to children."""

    features: int

    @nn.compact
    def __call__(self, parent_feat, child_point: PointBatch, su):
        n = child_point.num_points
        cin = parent_feat.shape[-1]
        weight = self.param("weight", _trunc_normal(0.02), (8, cin, self.features), jnp.float32)
        parent_pad = jnp.concatenate([parent_feat, jnp.zeros((1, cin), parent_feat.dtype)], axis=0)
        prow = jnp.minimum(su.parent_row, parent_feat.shape[0])
        gathered = jnp.take(parent_pad, prow, axis=0)  # [N, Cin]
        off = _child_offset_id(child_point.grid_coord)
        out = jnp.zeros((n, self.features), jnp.float32)
        for k in range(8):
            sel = ((off == k) & child_point.valid)[:, None]
            contrib = jax.lax.dot_general(
                gathered, weight[k], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            out = out + jnp.where(sel, contrib, 0.0)
        return out.astype(parent_feat.dtype)


@MODELS.register_module("SpUNet-v1m1")
@MODELS.register_module("SpUNet-v1m2")  # BN-momentum variant: pass bn_momentum
@MODELS.register_module("SpUNet-v1m3")  # PDNorm variant: pass pdnorm_conditions
class SpUNet(nn.Module):
    """MinkUNet-topology sparse U-Net over a PointBatch.

    Returns per-point logits [N, num_classes] (or features if num_classes==0),
    in the input point layout.
    """

    in_channels: int
    num_classes: int
    base_channels: int = 32
    channels: Sequence[int] = (32, 64, 128, 256, 256, 128, 96, 96)
    layers: Sequence[int] = (2, 3, 4, 6, 2, 2, 2, 2)
    stem_kernel: int = 5
    bn_momentum: float = 0.01
    # per-encoder-stage slot capacity divisor relative to the input slot size
    slot_divisors: Sequence[int] = (1, 2, 4, 8)
    # >0 enables PDNorm at every norm site, conditioned on the per-sample
    # dataset index (SpUNet-v1m3, `spconv_unet_v1m3_pdnorm.py`)
    pdnorm_conditions: int = 0

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False, condition=None):
        assert len(self.layers) % 2 == 0 and len(self.layers) == len(self.channels)
        num_stages = len(self.layers) // 2
        bnm = self.bn_momentum
        npd = self.pdnorm_conditions
        if npd and condition is None:
            condition = jnp.zeros((point.num_samples,), jnp.int32)

        def cond_of(pb):
            # per-point condition at any resolution: gather the per-sample
            # index by the point's sample id
            return jnp.take(condition, pb.batch) if npd else None

        # --- stem (SubMConv k=stem_kernel) --------------------------------
        batch = point.batch
        index0 = build_voxel_index(point.grid_coord, batch, point.valid, _DEPTH)
        kmap_stem = build_kernel_map(
            index0, point.grid_coord, batch, point.valid, SparseConvSpec.cube(self.stem_kernel), _DEPTH
        )
        kmap0 = (
            kmap_stem
            if self.stem_kernel == 3
            else build_kernel_map(index0, point.grid_coord, batch, point.valid, SparseConvSpec.cube(3), _DEPTH)
        )
        feat = SubMConv(self.base_channels, SparseConvSpec.cube(self.stem_kernel))(point.feat, kmap_stem)
        feat = _make_norm(self.base_channels, bnm, npd)(feat, point.valid, cond_of(point), train)
        feat = nn.relu(feat)
        point = point.replace(feat=feat)

        # --- encoder ------------------------------------------------------
        skips = [point]  # PointBatch per level (with feats)
        sus = []
        kmaps = [kmap0]
        slot = point.slot_size
        for s in range(num_stages):
            cap = max(slot // self.slot_divisors[s], 1)
            pooled, su = StridedConvDown(self.channels[s])(skips[-1], cap)
            feat = _make_norm(self.channels[s], bnm, npd)(pooled.feat, pooled.valid, cond_of(pooled), train)
            pooled = pooled.replace(feat=nn.relu(feat))
            b = pooled.batch
            idx = build_voxel_index(pooled.grid_coord, b, pooled.valid, _DEPTH)
            kmap = build_kernel_map(idx, pooled.grid_coord, b, pooled.valid, SparseConvSpec.cube(3), _DEPTH)
            for i in range(self.layers[s]):
                pooled = pooled.replace(
                    feat=BasicBlock(self.channels[s], bnm, npd)(
                        pooled.feat, pooled.valid, kmap, train, cond_of(pooled)
                    )
                )
            skips.append(pooled)
            sus.append(su)
            kmaps.append(kmap)

        # --- decoder ------------------------------------------------------
        x = skips[-1]
        for s in reversed(range(num_stages)):
            dec_ch = self.channels[len(self.channels) - s - 2]
            skip = skips[s]
            up = InverseConvUp(dec_ch)(x.feat, skip, sus[s])
            up = _make_norm(dec_ch, bnm, npd)(up, skip.valid, cond_of(skip), train)
            up = nn.relu(up)
            x = skip.replace(feat=jnp.concatenate([up, skip.feat], axis=-1))
            for i in range(self.layers[len(self.channels) - s - 1]):
                x = x.replace(
                    feat=BasicBlock(dec_ch, bnm, npd)(x.feat, x.valid, kmaps[s], train, cond_of(x))
                )

        if self.num_classes > 0:
            logits = nn.Dense(self.num_classes, kernel_init=_trunc_normal(0.02))(x.feat)
            return logits
        return x.feat
