"""CAC — Context-Aware Classifier segmentation head.

Capability parity with `pointcept/models/context_aware_classifier/
context_aware_classifier_v1m1_base.py`: alongside a linear segmentation head,
class centers are estimated from the current batch's ground truth (train) or
an EMA bank (eval); per-point logits from feature-center affinity refine the
prediction, with auxiliary losses on both branches.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..parallel.mesh import psum_if_bound
from .builder import MODELS, build_model
from .losses import build_criteria
from .structure import PointBatch


@MODELS.register_module("CAC-v1m1")
class CACSegmentor(nn.Module):
    backbone: Dict[str, Any]
    num_classes: int = 20
    backbone_out_channels: int = 96
    cos_temp: float = 15.0
    main_weight: float = 1.0
    pre_weight: float = 1.0
    kl_weight: float = 1.0
    center_momentum: float = 0.9
    criteria: Sequence[Dict[str, Any]] = (dict(type="CrossEntropyLoss"),)

    @nn.compact
    def __call__(self, point: PointBatch, batch: Dict[str, jnp.ndarray], train: bool = False):
        feat = build_model(dict(self.backbone))(point, train=train)
        c = feat.shape[-1]
        K = self.num_classes
        pre_logits = nn.Dense(K, name="seg_head")(feat)

        bank = self.variable(
            "batch_stats", "class_centers", lambda: jnp.zeros((K, c), jnp.float32)
        )
        fnorm = feat / jnp.maximum(jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-6)

        if train and "segment" in batch:
            seg = batch["segment"]
            ok = (seg >= 0) & point.valid
            onehot = jax.nn.one_hot(jnp.where(ok, seg, 0), K) * ok[:, None]
            # psum_if_bound: global class centers under the shard_map step
            cnt = psum_if_bound(jnp.sum(onehot, axis=0))
            counts = jnp.maximum(cnt, 1.0)[:, None]
            centers = psum_if_bound(onehot.T @ feat.astype(jnp.float32)) / counts
            seen = (cnt > 0)[:, None]
            if not self.is_initializing():
                m = self.center_momentum
                bank.value = jnp.where(
                    seen, m * bank.value + (1 - m) * centers, bank.value
                )
        else:
            centers = bank.value

        cnorm = centers / jnp.maximum(jnp.linalg.norm(centers, axis=-1, keepdims=True), 1e-6)
        cac_logits = self.cos_temp * (fnorm @ cnorm.T.astype(fnorm.dtype))

        out = {"seg_logits": cac_logits, "pre_logits": pre_logits}
        if "segment" in batch and len(self.criteria) > 0:
            crit = build_criteria([dict(cc) for cc in self.criteria])
            loss_main = crit(cac_logits, batch["segment"], valid=point.valid)
            loss_pre = crit(pre_logits, batch["segment"], valid=point.valid)
            # consistency: keep both branches aligned (KL of cac || pre)
            p_main = jax.nn.log_softmax(cac_logits.astype(jnp.float32), -1)
            p_pre = jax.nn.softmax(pre_logits.astype(jnp.float32), -1)
            kl = jnp.sum(p_pre * (jnp.log(jnp.maximum(p_pre, 1e-8)) - p_main), -1)
            w = point.valid.astype(jnp.float32)
            loss_kl = jnp.sum(kl * w) / jnp.maximum(jnp.sum(w), 1.0)
            out["loss"] = (
                self.main_weight * loss_main + self.pre_weight * loss_pre + self.kl_weight * loss_kl
            )
        return out
