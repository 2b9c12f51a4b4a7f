"""Task wrapper models.

Parity surface: `pointcept/models/default.py` — ``DefaultSegmentor`` (backbone
emits logits, criteria applied outside), ``DefaultClassifier`` (global pooled
MLP head).  Convention: every wrapper is a linen Module called as
``model(point, batch, train)`` where ``batch`` is the collated target dict;
it returns a dict (``loss`` when targets are present, plus task outputs),
mirroring the reference's output-dict contract.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.segment import segment_mean
from .builder import MODELS, build_model
from .losses import build_criteria
from .norm import MaskedBatchNorm
from .structure import PointBatch


@MODELS.register_module()
class DefaultSegmentor(nn.Module):
    """backbone -> per-point logits; loss = criteria(logits, segment)."""

    backbone: Dict[str, Any]
    criteria: Sequence[Dict[str, Any]] = ()

    @nn.compact
    def __call__(self, point: PointBatch, batch: Dict[str, jnp.ndarray], train: bool = False):
        logits = build_model(dict(self.backbone))(point, train=train)
        out = {"seg_logits": logits}
        if "segment" in batch and len(self.criteria) > 0:
            crit = build_criteria([dict(c) for c in self.criteria])
            out["loss"] = crit(logits, batch["segment"], valid=point.valid)
        return out


@MODELS.register_module()
class DefaultClassifier(nn.Module):
    """backbone features -> per-sample mean pool -> MLP classifier head.

    Mirrors `models/default.py:289-338` (segment_csr mean pool + cls head).
    """

    backbone: Dict[str, Any]
    criteria: Sequence[Dict[str, Any]] = ()
    num_classes: int = 40

    @nn.compact
    def __call__(self, point: PointBatch, batch: Dict[str, jnp.ndarray], train: bool = False):
        feat = build_model(dict(self.backbone))(point, train=train)
        pooled = segment_mean(feat * point.valid[:, None], point.batch, point.num_samples)
        x = nn.Dense(256)(pooled)
        x = MaskedBatchNorm(256, momentum=0.1, eps=1e-5)(x, jnp.ones(x.shape[0], bool), not train)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(128)(x)
        x = MaskedBatchNorm(128, momentum=0.1, eps=1e-5)(x, jnp.ones(x.shape[0], bool), not train)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes)(x)
        out = {"cls_logits": logits}
        if "category" in batch and len(self.criteria) > 0:
            crit = build_criteria([dict(c) for c in self.criteria])
            out["loss"] = crit(logits, batch["category"].reshape(-1), valid=None)
        return out
