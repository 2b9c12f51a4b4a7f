"""Task wrapper models.

Parity surface: `pointcept/models/default.py` — ``DefaultSegmentor`` (backbone
emits logits, criteria applied outside), ``DefaultClassifier`` (global pooled
MLP head).  Convention: every wrapper is a linen Module called as
``model(point, batch, train)`` where ``batch`` is the collated target dict;
it returns a dict (``loss`` when targets are present, plus task outputs),
mirroring the reference's output-dict contract.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.knn import knn
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
        # recoverable with mutable=["intermediates"]: the SLAM place-
        # recognition frontend pools this into a learned scan embedding
        # (tools/run_slam.py); a dead store under plain apply()
        self.sow("intermediates", "backbone_feat", logits)
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


@MODELS.register_module()
class DefaultSegmentorV2(nn.Module):
    """Feature-mode backbone + linear seg head in the wrapper.

    Mirrors `models/default.py:40-96`: the backbone returns per-point features
    (num_classes=0 / enc feature mode) and the wrapper owns the segmentation
    head.  The reference's multi-scale ``pooling_parent`` concat is folded
    into the backbones' built-in U-Net decoders here (every TPU backbone
    already emits full-resolution decoder features).
    """

    backbone: Dict[str, Any]
    num_classes: int = 20
    backbone_out_channels: int = 64
    criteria: Sequence[Dict[str, Any]] = ()

    @nn.compact
    def __call__(self, point: PointBatch, batch: Dict[str, jnp.ndarray], train: bool = False):
        feat = build_model(dict(self.backbone))(point, train=train)
        # pre-head decoder features, recoverable with mutable=["intermediates"]
        # (pooled into the SLAM frontend's learned scan embedding)
        self.sow("intermediates", "backbone_feat", feat)
        logits = nn.Dense(self.num_classes, name="seg_head")(feat)
        out = {"seg_logits": logits}
        if "segment" in batch and len(self.criteria) > 0:
            crit = build_criteria([dict(c) for c in self.criteria])
            out["loss"] = crit(logits, batch["segment"], valid=point.valid)
        return out


@MODELS.register_module()
class DINOEnhancedSegmentor(nn.Module):
    """Segmentor augmented with knn-matched 2D DINO features.

    Mirrors `pointcept/models/default.py:206-288`: an optional (freezable) 3D
    backbone produces per-point features; each point additionally receives the
    feature of its nearest neighbour in a side "DINO point cloud"
    (``dino_coord``/``dino_feat`` lifted from posed RGB frames); the seg head
    runs on the concatenation.  The reference's ``torch_cluster.knn`` becomes
    the chunked MXU knn in ``ops/knn.py`` with per-sample batch masking.
    """

    backbone: Optional[Dict[str, Any]] = None
    num_classes: int = 20
    backbone_out_channels: int = 64
    criteria: Sequence[Dict[str, Any]] = ()
    freeze_backbone: bool = False

    @nn.compact
    def __call__(self, point: PointBatch, batch: Dict[str, jnp.ndarray], train: bool = False):
        feats = []
        if self.backbone is not None:
            feat = build_model(dict(self.backbone))(point, train=train and not self.freeze_backbone)
            if self.freeze_backbone:
                feat = jax.lax.stop_gradient(feat)
            feats.append(feat)

        dino_coord = batch["dino_coord"]  # [M, 3] padded slots
        dino_feat = batch["dino_feat"]  # [M, C]
        dino_valid = batch.get("dino_valid")
        m = dino_coord.shape[0]
        dino_batch = (
            jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) // (m // point.num_samples)
        ).reshape(m)
        # knn in the UNAUGMENTED world frame: the DINO side cloud never goes
        # through the augmentation pipeline, so matching must use the points'
        # original coordinates (reference knns on `point.origin_coord`,
        # `models/default.py:259-267`); configs carry them via
        # Copy(coord->origin_coord) before augmentation
        query_coord = batch.get("origin_coord", point.coord)
        idx, _ = knn(
            query_coord,
            dino_coord,
            k=1,
            query_batch=point.batch,
            base_batch=dino_batch,
            base_valid=dino_valid,
        )
        feats.append(dino_feat[idx[:, 0]])
        feat = jnp.concatenate(feats, axis=-1)
        logits = nn.Dense(self.num_classes, name="seg_head")(feat)
        out = {"seg_logits": logits}
        if "segment" in batch and len(self.criteria) > 0:
            crit = build_criteria([dict(c) for c in self.criteria])
            out["loss"] = crit(logits, batch["segment"], valid=point.valid)
        return out


@MODELS.register_module()
class PigBodyRegressor(nn.Module):
    """7-dim body-measure/weight regression with real-unit MAE logging.

    Mirrors `pointcept/models/pig_regressor.py:15-57` (DefaultClassifier
    subclass whose head emits measurements; per-measure MAE in the output).
    """

    backbone: Dict[str, Any]
    num_measures: int = 7
    criteria: Sequence[Dict[str, Any]] = (dict(type="RegressionL1Loss"),)

    @nn.compact
    def __call__(self, point: PointBatch, batch: Dict[str, jnp.ndarray], train: bool = False):
        feat = build_model(dict(self.backbone))(point, train=train)
        pooled = segment_mean(feat * point.valid[:, None], point.batch, point.num_samples)
        x = nn.Dense(256)(pooled)
        x = nn.relu(x)
        x = nn.Dense(128)(x)
        x = nn.relu(x)
        pred = nn.Dense(self.num_measures, name="cls_head")(x)
        out = {"measure_pred": pred}
        if "weight_label" in batch:
            target = batch["weight_label"].reshape(-1, self.num_measures)
            crit = build_criteria([dict(c) for c in self.criteria])
            out["loss"] = crit(pred, target)
            mae = jnp.mean(jnp.abs(pred - target), axis=0)
            for i in range(self.num_measures):
                out[f"mae_{i}"] = mae[i]
        return out
