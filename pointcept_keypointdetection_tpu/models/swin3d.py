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
* Full cRSE (`swin3d_layers.py:384-578`, ``SelfAttnAIOFunction``): per-signal
  (XYZ sub-voxel position / RGB / normal), per-axis tables on query, key AND
  value.  The CUDA kernel's on-the-fly per-pair table reads become MXU
  contractions: ``A[i, l] = q_i . Tq[l]`` is one [K, d] x [d, 2L] matmul per
  axis, the pair bias is a gather ``A[i, rel_ij]``; the value term
  ``sum_j a_ij Tv[rel_ij]`` becomes a scatter-histogram over table slots
  followed by ``H @ Tv``.  Signals ride the U-Net like the reference's
  ``coords_sp`` (head-point pooled at every downsample).
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
    window_size: int  # voxels (power of 2)
    shifted: bool = False
    # contextual relative signal embedding (`swin3d_layers.py:411-470`):
    # "XYZ" | "XYZ_RGB" | "XYZ_RGB_NORM"; quant_size = sub-voxel quantization
    crse: str = "XYZ_RGB"
    quant_size: int = 4

    def _crse_group(self, name, sig_s, scale, length, p, k, h, d, q_scaled, keys, attn_shape):
        """One signal group's (bias, value-table, rel-index) contribution.

        sig_s: [N, 3] sorted signal; index = floor(s_i*scale) - floor(s_j*scale)
        + length, table = [3 axes, 2*length, h, d] for each of q/k/v.
        """
        tq = self.param(f"{name}_q_table", nn.initializers.truncated_normal(0.02),
                        (3, 2 * length, h, d), jnp.float32)
        tk = self.param(f"{name}_k_table", nn.initializers.truncated_normal(0.02),
                        (3, 2 * length, h, d), jnp.float32)
        tv = self.param(f"{name}_v_table", nn.initializers.truncated_normal(0.02),
                        (3, 2 * length, h, d), jnp.float32)
        si = jnp.floor(sig_s.astype(jnp.float32) * scale).astype(jnp.int32).reshape(p, k, 3)
        rel = si[:, :, None, :] - si[:, None, :, :] + length  # [p, k, k, 3]
        rel = jnp.clip(rel, 0, 2 * length - 1)
        bias = jnp.zeros(attn_shape, jnp.float32)  # [p, h, k, k]
        for a in range(3):
            # A[p,h,i,l] = q_i . tq[a,l]  (MXU contraction over d)
            A = jnp.einsum("phkd,lhd->phkl", q_scaled, tq[a], preferred_element_type=jnp.float32)
            B = jnp.einsum("phkd,lhd->phkl", keys, tk[a], preferred_element_type=jnp.float32)
            # gather A[i, rel_ij]: expand rel over heads
            rh = jnp.broadcast_to(rel[..., a][:, None, :, :], attn_shape)  # [p,h,k,k]
            bias = bias + jnp.take_along_axis(A, rh, axis=-1)
            # gather B[j, rel_ij]: B is indexed by j -> transpose key axis
            bias = bias + jnp.take_along_axis(B, rh.transpose(0, 1, 3, 2), axis=-1).transpose(0, 1, 3, 2)
        return bias, tv, rel

    @nn.compact
    def __call__(self, point: PointBatch, train: bool, sig=None, cont=None, stride: int = 1):
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

        n = point.num_points
        p = n // k
        wbits = (w - 1).bit_length()
        win_code = code_shr(Code64(hi=jnp.take(code.hi, order), lo=jnp.take(code.lo, order)), 3 * wbits)

        qkv_p = qkv_s.reshape(p, k, 3, h, d)
        q = qkv_p[:, :, 0].transpose(0, 2, 1, 3) * (d**-0.5)
        kk = qkv_p[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv_p[:, :, 2].transpose(0, 2, 1, 3)
        logits = jnp.einsum("phkd,phmd->phkm", q, kk, preferred_element_type=jnp.float32)

        # same-window + validity mask
        wh = win_code.hi.reshape(p, k)
        wl = win_code.lo.reshape(p, k)
        same = (wh[:, :, None] == wh[:, None, :]) & (wl[:, :, None] == wl[:, None, :])
        vmask = valid_s.reshape(p, k)
        mask = same & vmask[:, None, :]

        # ---- cRSE ---------------------------------------------------------
        qs = self.quant_size
        if cont is None:
            cont = point.grid_coord.astype(jnp.float32) + 0.5
        cont_s = (jnp.take(cont, order, axis=0) / float(stride)) + float(shift)
        local = cont_s - jnp.floor(cont_s / w) * w  # sub-voxel position in [0, w)
        groups = [("xyz", local, float(qs), w * qs)]
        if sig is None:
            sig = jnp.zeros((n, 6), jnp.float32)
        sig_s = jnp.take(sig, order, axis=0)
        if "RGB" in self.crse:
            # color in [-1, 1], color_windowsize=2, color_quant = 2*quant
            groups.append(("rgb", sig_s[:, 0:3], float(2 * qs), 2 * (2 * qs)))
        if "NORM" in self.crse:
            groups.append(("norm", sig_s[:, 3:6], float(2 * qs), 2 * (2 * qs)))

        value_terms = []
        for name, s_arr, scale, length in groups:
            bias, tv, rel = self._crse_group(
                name, s_arr, scale, length, p, k, h, d, q, kk, logits.shape
            )
            logits = logits + bias
            value_terms.append((tv, rel, length))

        logits = jnp.where(mask[:, None, :, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("phkm,phmd->phkd", attn.astype(v.dtype), v, preferred_element_type=jnp.float32)

        # value-table terms: out_i += sum_l H[i, l] Tv[l] with
        # H[i, l] = sum_j attn_ij [rel_ij == l] (scatter-histogram per axis)
        for tv, rel, length in value_terms:
            for a in range(3):
                rh = jnp.broadcast_to(rel[..., a][:, None, :, :], attn.shape)
                H = jnp.zeros((p, h, k, 2 * length), jnp.float32)
                H = H.at[
                    jnp.arange(p)[:, None, None, None],
                    jnp.arange(h)[None, :, None, None],
                    jnp.arange(k)[None, None, :, None],
                    rh,
                ].add(attn)
                out = out + jnp.einsum("phkl,lhd->phkd", H, tv[a], preferred_element_type=jnp.float32)

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
    crse: str = "XYZ_RGB"
    quant_size: int = 4

    @nn.compact
    def __call__(self, point: PointBatch, train: bool, sig=None, cont=None, stride: int = 1):
        shortcut = point.feat
        x = LayerNorm(self.channels, name="norm1")(point.feat)
        x = WindowAttention(
            self.channels, self.num_heads, self.patch_size, self.window_size,
            self.shifted, crse=self.crse, quant_size=self.quant_size, name="attn",
        )(point.replace(feat=x), train, sig=sig, cont=cont, stride=stride)
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
            head,
        )


class KnnUpsample(nn.Module):
    out_channels: int
    knn_cell_size: float = 0.0  # >0: grid-bucketed 3-NN (scales past 100k pts)

    @nn.compact
    def __call__(self, pooled: PointBatch, skip: PointBatch, train: bool):
        c = self.out_channels
        f = nn.Dense(c, name="proj")(pooled.feat)
        interp = three_nn_interpolate(
            skip.coord, pooled.coord, f,
            query_batch=skip.batch, base_batch=pooled.batch, base_valid=pooled.valid,
            cell_size=self.knn_cell_size,
        )
        sk = nn.Dense(c, name="proj_skip")(skip.feat)
        return skip.replace(feat=LayerNorm(c, name="norm")(interp + sk))


@MODELS.register_module("Swin3D-v1m1")
class Swin3DUNet(nn.Module):
    in_channels: int = 6
    depths: Sequence[int] = (2, 2, 6, 2)
    channels: Sequence[int] = (48, 96, 192, 384)
    # per-decoder-level bucketed-3NN cell sizes for KnnUpsample (empty ->
    # brute force); level s interpolates from the level-s+1 grid, so pass
    # ~2x that level's world-space pitch (VERDICT r2 item 7)
    upsample_cell_sizes: Sequence[float] = ()
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_sizes: Sequence[int] = (4, 4, 4, 4)  # voxels per window edge (pow2)
    patch_size: int = 128
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.3
    slot_divisors: Sequence[int] = (1, 2, 4, 8)
    num_classes: int = 0
    # cRSE mode (`swin3d_layers.py:411`, reference default "XYZ_RGB"): RGB
    # reads point.feat[:, 0:3], NORM reads point.feat[:, 3:6] — the reference
    # builds its coords_sp signal tensor the same way (color then normal,
    # `swin3d_v1m1_base.py:183-200`); signals are expected roughly in [-1, 1]
    crse: str = "XYZ_RGB"
    quant_size: int = 4
    # pipeline GridSample size: recovers sub-voxel positions for the XYZ
    # signal (the reference keeps continuous coords in coords_sp)
    voxel_size: float = 0.05

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False):
        num_stages = len(self.depths)
        slot0 = point.slot_size
        feat = nn.Dense(self.channels[0], name="embed")(point.feat)
        feat = MaskedBatchNorm(self.channels[0], name="embed_norm")(feat, point.valid, not train)

        # signal carrier (the reference's coords_sp): continuous voxel-unit
        # position + raw rgb/normal channels, head-point pooled per stage
        resid = point.coord - self.voxel_size * point.grid_coord.astype(jnp.float32)
        anchor = segment_mean(
            jnp.where(point.valid[:, None], resid, 0.0), point.batch, point.num_samples
        )
        cont = (point.coord - jnp.take(anchor, point.batch, axis=0)) / self.voxel_size
        cin = point.feat.shape[-1]
        sig = point.feat[:, : min(cin, 6)].astype(jnp.float32)
        if cin < 6:
            sig = jnp.concatenate([sig, jnp.zeros((point.num_points, 6 - cin))], axis=1)

        x = point.replace(feat=nn.gelu(feat))

        total = sum(self.depths)
        blk = 0
        skips, conts, sigs = [], [], []
        for s in range(num_stages):
            if s > 0:
                skips.append(x)
                conts.append(cont)
                sigs.append(sig)
                cap = max(slot0 // self.slot_divisors[s], self.patch_size)
                cap = -(-cap // self.patch_size) * self.patch_size
                x, su, head = GridDownsample(self.channels[s], name=f"down{s}")(x, cap, train)
                cont = jnp.take(cont, head, axis=0)
                sig = jnp.take(sig, head, axis=0)
            for i in range(self.depths[s]):
                x = SwinBlock(
                    self.channels[s], self.num_heads[s], self.patch_size,
                    self.window_sizes[s], shifted=(i % 2 == 1), mlp_ratio=self.mlp_ratio,
                    drop_path=self.drop_path_rate * blk / max(total - 1, 1),
                    crse=self.crse, quant_size=self.quant_size,
                    name=f"stage{s}_block{i}",
                )(x, train, sig=sig, cont=cont, stride=1 << s)
                blk += 1

        for s in reversed(range(num_stages - 1)):
            cell = (
                self.upsample_cell_sizes[s]
                if len(self.upsample_cell_sizes) > s
                else 0.0
            )
            x = KnnUpsample(self.channels[s], knn_cell_size=cell, name=f"up{s}")(x, skips[s], train)
            x = SwinBlock(
                self.channels[s], self.num_heads[s], self.patch_size,
                self.window_sizes[s], shifted=False, mlp_ratio=self.mlp_ratio,
                crse=self.crse, quant_size=self.quant_size,
                name=f"dec{s}_block",
            )(x, train, sig=sigs[s], cont=conts[s], stride=1 << s)

        if self.num_classes > 0:
            return nn.Dense(self.num_classes, name="head")(x.feat)
        return x.feat
