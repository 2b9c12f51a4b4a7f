"""SGIFormer — query-based instance segmentation, TPU-native.

Capability parity with `pointcept/models/sgiformer/sgiformer_v1m1_base.py`
(1249 LoC + `loss.py` matcher):

* point-level auxiliary heads: semantic logits + center-shift bias
  (`:298-310`, supervised alongside the set loss);
* SAMPLED queries — the top ``alpha`` fraction of points by class confidence
  are soft-pooled through a representation layer into ``num_sample_query``
  queries, concatenated with ``num_learn_query`` learned embeddings
  (`:404-415`);
* multi-layer decoding:每 layer cross-attention (gated by the CURRENT mask
  predictions when ``use_attn_mask``), self-attention, FFN, with key-feature
  refresh layers between decoder layers and a prediction head after EVERY
  layer (`:434-461`);
* per-layer auxiliary Hungarian-matched set losses (class CE + mask BCE +
  mask Dice, `loss.py`), plus the point seg/bias losses;
* Fourier positional embeddings on the keys (`PositionEmbeddingCoordsSine`).

TPU re-design: padded slots make every per-sample split a reshape — queries
are [B, Q, d], keys are a per-sample strided subsample [B, S/stride, d] (the
reference pools superpoints; a strided subsample is the static-shape
analogue), and the Hungarian assignment runs through ``jax.pure_callback``
(scipy) vmapped sequentially over the batch.
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


def fourier_pos_embed(coord, dim, rng_proj):
    """Fourier positional embedding (`PositionEmbeddingCoordsSine:26-188`):
    normalized coords through a fixed Gaussian projection -> sin/cos."""
    # coord [B, M, 3] normalized to [0, 1] per sample
    mn = jnp.min(coord, axis=1, keepdims=True)
    mx = jnp.max(coord, axis=1, keepdims=True)
    x = (coord - mn) / jnp.maximum(mx - mn, 1e-6)
    proj = x @ rng_proj  # [B, M, dim//2]
    return jnp.concatenate([jnp.sin(2 * jnp.pi * proj), jnp.cos(2 * jnp.pi * proj)], axis=-1)


class DecoderLayer(nn.Module):
    dim: int
    num_heads: int = 8
    hidden: int = 1024

    @nn.compact
    def __call__(self, queries, keys, key_mask, attn_mask=None):
        # cross attention (post-norm like the reference CrossAttentionLayer)
        mask = key_mask[:, None, None, :]
        if attn_mask is not None:
            # per-(query, key) gate from the current mask predictions; a
            # query whose mask selects nothing sees all keys (`:215-222`)
            am = attn_mask & key_mask[:, None, :]
            any_key = jnp.any(am, axis=-1, keepdims=True)
            am = jnp.where(any_key, am, key_mask[:, None, :])
            mask = mask & am[:, None, :, :]
        attn = nn.MultiHeadDotProductAttention(num_heads=self.num_heads, name="cross")(
            queries, keys, keys, mask=mask
        )
        queries = nn.LayerNorm(name="norm1")(queries + attn)
        attn = nn.MultiHeadDotProductAttention(num_heads=self.num_heads, name="self")(
            queries, queries
        )
        queries = nn.LayerNorm(name="norm2")(queries + attn)
        h = nn.Dense(self.hidden, name="ffn1")(queries)
        h = nn.relu(h)
        queries = nn.LayerNorm(name="norm3")(queries + nn.Dense(self.dim, name="ffn2")(h))
        return queries


class KeyRefresh(nn.Module):
    """Key-feature refresh between decoder layers (`:337-349,448-459`)."""

    dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, keys, queries, key_pos, key_mask):
        attn = nn.MultiHeadDotProductAttention(num_heads=self.num_heads, name="cross")(
            keys + key_pos, queries, queries
        )
        keys = nn.LayerNorm(name="norm1")(keys + attn)
        attn = nn.MultiHeadDotProductAttention(num_heads=self.num_heads, name="self")(
            keys + key_pos, keys + key_pos, keys, mask=key_mask[:, None, None, :]
        )
        keys = nn.LayerNorm(name="norm2")(keys + attn)
        return keys


@MODELS.register_module("SGIFormer-v1m1")
class SGIFormer(nn.Module):
    backbone: Dict[str, Any]
    num_classes: int = 18
    num_sample_query: int = 64
    num_learn_query: int = 64
    dec_dim: int = 128
    dec_layers: int = 3
    num_heads: int = 8
    ffn_hidden: int = 512
    key_stride: int = 8  # strided subsample as attention keys (superpoint analogue)
    alpha: float = 0.4  # fraction of points pooled into sampled queries
    use_attn_mask: bool = True
    segment_ignore_index: Sequence[int] = (-1, 0, 1)
    class_weight: float = 2.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    seg_weight: float = 1.0
    bias_weight: float = 1.0
    max_instances: int = 64  # static GT instance capacity

    @nn.compact
    def __call__(self, point: PointBatch, batch: Dict[str, jnp.ndarray], train: bool = False):
        feat = build_model(dict(self.backbone))(point, train=train)
        c = self.dec_dim
        cin = feat.shape[-1]
        B = point.num_samples
        S = point.num_points // B

        # point-level auxiliary heads (`:298-310`)
        h = nn.Dense(cin, name="seg_fc")(feat)
        h = nn.LayerNorm(name="seg_norm")(h)
        seg_logits = nn.Dense(self.num_classes + 1, name="seg_out")(nn.relu(h))
        h = nn.Dense(cin, name="bias_fc")(feat)
        h = nn.LayerNorm(name="bias_norm")(h)
        bias_pred = nn.Dense(3, name="bias_out")(nn.relu(h))

        pf = nn.Dense(c, name="point_proj")(feat)  # mask features [N, C]
        proj = nn.Dense(c, name="feat_proj")(feat)
        proj = nn.relu(nn.LayerNorm(name="feat_proj_norm")(proj))

        valid_b = point.valid.reshape(B, S)
        proj_b = proj.reshape(B, S, c)

        # ---- sampled queries (`:404-415`) --------------------------------
        score = jax.nn.softmax(seg_logits.astype(jnp.float32), -1)[:, : self.num_classes]
        conf = jnp.max(score, axis=-1).reshape(B, S)
        conf = jnp.where(valid_b, conf, -jnp.inf)
        k_top = max(int(self.alpha * S), self.num_sample_query)
        top_conf, top_idx = jax.lax.top_k(conf, k_top)  # [B, K]
        top_feat = jnp.take_along_axis(proj_b, top_idx[..., None], axis=1)  # [B, K, c]
        rep = nn.Dense(self.num_sample_query, name="rep")(top_feat)
        rep = nn.LayerNorm(name="rep_norm")(rep)
        rep = jnp.where(jnp.isfinite(top_conf)[..., None], rep, -1e9)
        act = jax.nn.softmax(rep, axis=1)  # softmax over the K points
        q_samp = jnp.einsum("bkq,bkc->bqc", act, top_feat)
        q_learn = self.param(
            "query_embed", nn.initializers.normal(0.02), (self.num_learn_query, c), jnp.float32
        ).astype(pf.dtype)
        queries = jnp.concatenate(
            [q_samp, jnp.broadcast_to(q_learn, (B, self.num_learn_query, c))], axis=1
        )

        # ---- keys: per-sample strided subsample + fourier pos ------------
        keys = proj_b[:, :: self.key_stride]  # [B, M, c]
        key_valid = valid_b[:, :: self.key_stride]
        shifted = (point.coord + bias_pred).reshape(B, S, 3)
        key_coord = shifted[:, :: self.key_stride]
        fproj = self.param(
            "fourier_proj", nn.initializers.normal(1.0), (3, c // 2), jnp.float32
        )
        key_pos = fourier_pos_embed(key_coord, c, jax.lax.stop_gradient(fproj)).astype(keys.dtype)
        mask_keys = nn.Dense(c, name="x_mask")(keys)
        mask_keys = nn.relu(mask_keys)

        pf_b = pf.reshape(B, S, c)

        def head(q, layer):
            qn = nn.LayerNorm(name=f"head_norm{layer}")(q)
            hcls = nn.Dense(c, name=f"head_cls_fc{layer}")(qn)
            cls = nn.Dense(self.num_classes + 1, name=f"head_cls_out{layer}")(nn.relu(hcls))
            membed = nn.Dense(c, name=f"head_mask{layer}")(qn)
            masks = jnp.einsum("bqc,bnc->bqn", membed, pf_b)  # [B, Q, S]
            key_masks = jnp.einsum("bqc,bmc->bqm", membed, mask_keys)
            return cls, masks, key_masks

        preds = [head(queries, 0)]
        for li in range(self.dec_layers):
            attn_mask = (preds[-1][2] > 0) if self.use_attn_mask else None
            queries = DecoderLayer(c, self.num_heads, self.ffn_hidden, name=f"dec{li}")(
                queries, keys + key_pos, key_valid, attn_mask
            )
            if li < self.dec_layers - 1:
                keys = KeyRefresh(c, self.num_heads, name=f"refresh{li}")(
                    keys, queries, key_pos, key_valid
                )
            preds.append(head(queries, li + 1))

        cls_logits, mask_logits, _ = preds[-1]
        out = {
            "pred_classes": cls_logits[0] if B == 1 else cls_logits,
            "pred_masks": mask_logits[0] if B == 1 else mask_logits,
            "seg_logits": seg_logits[:, : self.num_classes],
            "bias_pred": bias_pred,
        }
        if "instance" in batch and "segment" in batch:
            instance = batch["instance"].reshape(B, S)
            segment = batch["segment"].reshape(B, S)
            total = jnp.zeros((), jnp.float32)
            # per-layer auxiliary set losses (`loss.py`; every layer incl. 0)
            for cls_l, mask_l, _ in preds:
                total = total + self._set_loss_batched(
                    cls_l, mask_l, instance, segment, valid_b
                )
            total = total / len(preds)
            # point-level aux losses: semantic CE + masked L1 center shift
            seg_t = jnp.where(point.valid & (batch["segment"] >= 0), batch["segment"], self.num_classes)
            logp = jax.nn.log_softmax(seg_logits.astype(jnp.float32), -1)
            wv = (point.valid & (batch["segment"] >= 0)).astype(jnp.float32)
            seg_loss = -jnp.sum(jnp.take_along_axis(logp, seg_t[:, None], 1)[:, 0] * wv) / jnp.maximum(
                jnp.sum(wv), 1.0
            )
            total = total + self.seg_weight * seg_loss
            if "instance_centroid" in batch:
                gt_bias = batch["instance_centroid"] - point.coord
                mi = (batch["instance"] != -1) & point.valid
                wb = mi.astype(jnp.float32)
                bias_loss = jnp.sum(
                    jnp.abs(bias_pred.astype(jnp.float32) - gt_bias).sum(-1) * wb
                ) / jnp.maximum(jnp.sum(wb), 1.0)
                total = total + self.bias_weight * bias_loss
            out["loss"] = total
        return out

    def _set_loss_batched(self, cls_logits, mask_logits, instance, segment, valid):
        per_sample = jax.vmap(self._set_loss)
        losses = per_sample(cls_logits, mask_logits, instance, segment, valid)
        return jnp.mean(losses)

    def _set_loss(self, cls_logits, mask_logits, instance, segment, valid):
        max_inst = self.max_instances
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
