"""Keypoint-detection heads (the fork's flagship task family).

Parity surface:
* Global-regression heads ``Keypoint<Backbone>`` (`pointcept/models/
  keypoint_ptv3.py:37-98` and siblings keypoint_ptv1/ptv2/swin3d/oa_cnns/
  octformer/stratified_transformer/sparse_unet): backbone -> global mean pool
  -> MLP(hidden, BN, ReLU, Dropout 0.3) -> (K, 3); MSE loss in normalized
  space; train-time de-normalized distance logging.
* Dense offset heads ``OffsetKeypoint<Backbone>`` (`offset_keypoint_ptv3.py:
  37-107`): backbone -> per-point MLP -> (N, K, 4) = offset + mask logit;
  loss = BCEWithLogits(mask over all points) + 2.0 x masked L1(offset over
  mask>0.5 points).

The TPU build implements each family once over the config-driven backbone and
registers the per-backbone reference names as aliases, so reference configs
port over unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.segment import segment_mean
from .builder import MODELS, build_model
from .norm import MaskedBatchNorm
from .structure import PointBatch


class KeypointModel(nn.Module):
    """Global keypoint regression: mean-pool + MLP -> [B, K, 3]."""

    backbone_conf: Dict[str, Any]
    num_keypoints: int = 6
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, point: PointBatch, batch: Dict[str, jnp.ndarray], train: bool = False):
        feat = build_model(dict(self.backbone_conf))(point, train=train)
        w = point.valid[:, None].astype(feat.dtype)
        global_feat = segment_mean(feat * w, point.batch, point.num_samples)

        x = nn.Dense(self.hidden_dim)(global_feat)
        x = MaskedBatchNorm(self.hidden_dim, momentum=0.1, eps=1e-5)(
            x, jnp.ones(x.shape[0], bool), not train
        )
        x = nn.relu(x)
        x = nn.Dropout(0.3, deterministic=not train)(x)
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.relu(x)
        pred = nn.Dense(self.num_keypoints * 3)(x).reshape(-1, self.num_keypoints, 3)

        out = {"keypoint_pred": pred}
        if "keypoint" in batch:
            target = batch["keypoint"]
            loss = jnp.mean(jnp.square(pred - target))
            out["loss"] = loss
            dist = jnp.linalg.norm(pred - target, axis=-1)  # [B, K]
            if "scale" in batch:
                dist = dist * batch["scale"].reshape(-1, 1)
            out["mean_dist"] = jnp.mean(dist)
        return out


class OffsetKeypointModel(nn.Module):
    """Dense per-point offset + mask head -> [N, K, 4]."""

    backbone_conf: Dict[str, Any]
    num_keypoints: int = 6
    hidden_dim: int = 256
    reg_loss_weight: float = 2.0

    @nn.compact
    def __call__(self, point: PointBatch, batch: Dict[str, jnp.ndarray], train: bool = False):
        feat = build_model(dict(self.backbone_conf))(point, train=train)
        x = nn.Dense(self.hidden_dim)(feat)
        x = nn.relu(x)
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.relu(x)
        pred = nn.Dense(self.num_keypoints * 4)(x).reshape(-1, self.num_keypoints, 4)
        offset_pred = pred[..., :3]
        mask_logits = pred[..., 3]

        out = {"offset_pred": offset_pred, "mask_logits": mask_logits}
        if "keypoint_offset" in batch:
            offset_gt = batch["keypoint_offset"]
            mask_gt = batch["keypoint_mask"]
            pvalid = point.valid[:, None].astype(jnp.float32)

            # BCE over all (valid) points
            ml = mask_logits.astype(jnp.float32)
            bce = -(mask_gt * jax.nn.log_sigmoid(ml) + (1 - mask_gt) * jax.nn.log_sigmoid(-ml))
            cls_loss = jnp.sum(bce * pvalid) / jnp.maximum(jnp.sum(pvalid) * self.num_keypoints, 1.0)

            # masked L1 over mask>0.5 points
            vm = (mask_gt > 0.5).astype(jnp.float32) * pvalid  # [N, K]
            l1 = jnp.abs(offset_pred.astype(jnp.float32) - offset_gt) * vm[..., None]
            reg_loss = jnp.sum(l1) / (jnp.sum(vm) * 3 + 1e-6)

            out["loss"] = cls_loss + reg_loss * self.reg_loss_weight
            out["cls_loss"] = cls_loss
            out["reg_loss"] = reg_loss
        return out


# Register under the reference model-type names so configs port directly.
for _name in (
    "KeypointPTv3",
    "KeypointPTv1",
    "KeypointPTv2",
    "KeypointSwin3D",
    "KeypointOACNNs",
    "KeypointOctFormer",
    "KeypointStratifiedTransformer",
    "KeypointSparseUNet",
    "KeypointModel",
):
    MODELS.register_module(name=_name, module=KeypointModel)

for _name in (
    "OffsetKeypointPTv3",
    "OffsetKeypointSwin3D",
    "OffsetKeypointOctFormer",
    "OffsetKeypointModel",
):
    MODELS.register_module(name=_name, module=OffsetKeypointModel)


class VoteKeypointModel(nn.Module):
    """Hough-voting keypoint head (parity: `keypoint_swin3d_plus.py:17-120`,
    KeypointSwin3DVote): per-point (K, 3) vote offsets, prediction =
    confidence-free mean of (point + vote) over points within ``vote_radius``
    of the keypoint; smooth-L1 vote loss restricted to in-radius points."""

    backbone_conf: Dict[str, Any]
    num_keypoints: int = 6
    hidden_dim: int = 256
    vote_radius: float = 0.5  # in normalized units

    @nn.compact
    def __call__(self, point: PointBatch, batch: Dict[str, jnp.ndarray], train: bool = False):
        feat = build_model(dict(self.backbone_conf))(point, train=train)
        x = nn.Dense(self.hidden_dim)(feat)
        x = nn.relu(x)
        votes = nn.Dense(self.num_keypoints * 3)(x).reshape(-1, self.num_keypoints, 3)
        pred_points = point.coord[:, None, :] + votes  # [N, K, 3]

        out = {"votes": votes}
        if "keypoint" in batch:
            kp = batch["keypoint"]  # [B, K, 3]
            B = point.num_samples
            S = point.slot_size
            kp_per_point = jnp.repeat(kp, S, axis=0).reshape(-1, self.num_keypoints, 3)
            dist = jnp.linalg.norm(point.coord[:, None, :] - kp_per_point, axis=-1)
            in_radius = (dist <= self.vote_radius) & point.valid[:, None]  # [N, K]

            diff = (pred_points - kp_per_point).astype(jnp.float32)
            absd = jnp.abs(diff)
            smooth_l1 = jnp.where(absd < 1.0, 0.5 * absd**2, absd - 0.5).sum(-1)
            w = in_radius.astype(jnp.float32)
            out["loss"] = jnp.sum(smooth_l1 * w) / jnp.maximum(jnp.sum(w) * 3, 1.0)

            # aggregated prediction: mean vote of in-radius points (train
            # monitoring; inference aggregates over predicted votes)
            wp = w.reshape(B, S, self.num_keypoints, 1)
            agg = jnp.sum(pred_points.reshape(B, S, self.num_keypoints, 3) * wp, axis=1) / jnp.maximum(
                jnp.sum(wp, axis=1), 1e-6
            )
            out["keypoint_pred"] = agg
            d = jnp.linalg.norm(agg - kp, axis=-1)
            if "scale" in batch:
                d = d * batch["scale"].reshape(-1, 1)
            out["mean_dist"] = jnp.mean(d)
        return out


for _name in ("KeypointSwin3DVote", "VoteKeypointModel"):
    MODELS.register_module(name=_name, module=VoteKeypointModel)

# KeypointPTv3Plus: the global-regression head over the Plus backbone
MODELS.register_module(name="KeypointPTv3Plus", module=KeypointModel)
