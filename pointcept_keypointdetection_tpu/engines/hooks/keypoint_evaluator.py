"""Keypoint evaluator hooks (fork parity).

* ``KeypointEvaluator`` (`pointcept/engines/hooks/keypoint_evaluator.py`):
  mean L2 distance between predicted and GT keypoints over the val set,
  de-normalized by the per-sample ``scale``; the published metric is negated
  so CheckpointSaver's bigger-is-better keeps the min-distance model
  (`keypoint_evaluator.py:84`).
* ``OffsetKeypointEvaluator`` (`offset_keypoint_evaluator.py`): reconstructs
  the GT keypoint as the mean of (point + offset) over mask>0 points
  (`:63-70`), the prediction from the argmax-confidence point + its regressed
  offset (`:74-78`), reports per-keypoint mean mm distance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.logger import get_root_logger
from ..common import build_point_batch
from .builder import HOOKS
from .default import HookBase


@HOOKS.register_module()
class KeypointEvaluator(HookBase):
    """For global-regression keypoint models emitting ``keypoint_pred`` [B,K,3]."""

    def __init__(self):
        self._eval_step = None

    def _build(self):
        model = self.trainer.model

        def eval_step(state, batch, num_samples: int):
            point = build_point_batch(batch, num_samples)
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats}, point, batch, train=False
            )
            pred = out["keypoint_pred"]  # [B, K, 3] normalized space
            gt = batch["keypoint"]
            dist = jnp.linalg.norm(pred - gt, axis=-1)  # [B, K]
            dist = dist * batch["scale"][:, None]  # de-normalize
            return jnp.sum(dist, axis=0), jnp.asarray(pred.shape[0], jnp.float32)

        self._eval_step = jax.jit(eval_step, static_argnums=(2,))

    def after_epoch(self):
        if self.trainer.val_loader is None:
            return
        if self._eval_step is None:
            self._build()
        from ...parallel.mesh import shard_batch

        trainer = self.trainer
        logger = get_root_logger()
        dist_sum = None
        count = 0.0
        for batch_np in trainer.val_loader:
            batch = shard_batch(batch_np, trainer.mesh)
            ns = batch.pop("num_samples", batch_np["num_samples"])
            d, n = self._eval_step(trainer.state, batch, ns)
            dist_sum = np.asarray(d) if dist_sum is None else dist_sum + np.asarray(d)
            count += float(n)
        per_kp = dist_sum / max(count, 1)
        mean_dist = float(per_kp.mean())
        for k, v in enumerate(per_kp):
            logger.info(f"Keypoint_{k} mean distance: {v:.2f}")
        logger.info(f"Val result: mean keypoint distance {mean_dist:.2f}")
        trainer.storage.put_scalar("val/keypoint_dist", mean_dist)
        trainer.comm_info["current_metric_value"] = -mean_dist  # min distance wins
        trainer.comm_info["current_metric_name"] = "neg_keypoint_dist"


def reconstruct_keypoints_from_offsets(coord, offset_pred, mask_prob, batch_idx, valid, num_samples):
    """Argmax-confidence reconstruction (jit-safe, vectorized over B and K).

    Returns pred keypoints [B, K, 3]: for each sample and keypoint, the point
    with max mask probability contributes ``point + offset``.
    """
    n, k, _ = offset_pred.shape
    cand = coord[:, None, :] + offset_pred  # [N, K, 3]
    conf = jnp.where(valid[:, None], mask_prob, -jnp.inf)  # [N, K]
    s = n // num_samples
    best = jnp.argmax(conf.reshape(num_samples, s, k), axis=1)  # [B, K] index within slot
    rows = best + (jnp.arange(num_samples, dtype=jnp.int32) * s)[:, None]  # [B, K]
    return cand[rows.reshape(-1), jnp.tile(jnp.arange(k), num_samples), :].reshape(num_samples, k, 3)


def reconstruct_keypoints_weighted(
    coord, offset_pred, mask_prob, valid, num_samples, threshold=0.5
):
    """Confidence-weighted reconstruction (`tools/infer_offset.py:573-597`).

    Mean of (point + offset) over points with mask prob > threshold, weighted
    by the probability; falls back to the argmax candidate when no point
    passes.  Averaging over the candidate set cancels per-point surface noise
    that the single-argmax-point estimate inherits.
    """
    n, k, _ = offset_pred.shape
    s = n // num_samples
    cand = (coord[:, None, :] + offset_pred).reshape(num_samples, s, k, 3)
    conf = jnp.where(valid[:, None], mask_prob, 0.0).reshape(num_samples, s, k)
    w = jnp.where(conf > threshold, conf, 0.0)[..., None]  # [B, S, K, 1]
    wsum = jnp.sum(w, axis=1)  # [B, K, 1]
    weighted = jnp.sum(cand * w, axis=1) / jnp.maximum(wsum, 1e-6)
    best = reconstruct_keypoints_from_offsets(
        coord, offset_pred, mask_prob, None, valid, num_samples
    )
    return jnp.where(wsum > 0, weighted, best)


@HOOKS.register_module()
class OffsetKeypointEvaluator(HookBase):
    """For dense offset models emitting ``offset_pred`` [N,K,3] + ``mask_logits`` [N,K].

    Reports BOTH reconstruction modes each epoch (`tools/infer_offset.py`
    aggregation options): ``argmax`` (reference evaluator parity,
    `hooks/offset_keypoint_evaluator.py:74-78`) and ``weighted``.  The
    checkpoint-selection metric follows ``aggregate`` (default argmax).
    """

    def __init__(self, aggregate: str = "argmax", threshold: float = 0.5):
        assert aggregate in ("argmax", "weighted"), aggregate
        self.aggregate = aggregate
        self.threshold = threshold
        self._eval_step = None

    def _build(self):
        model = self.trainer.model

        def eval_step(state, batch, num_samples: int):
            point = build_point_batch(batch, num_samples)
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats}, point, batch, train=False
            )
            offset_pred = out["offset_pred"]  # [N, K, 3]
            mask_prob = jax.nn.sigmoid(out["mask_logits"])  # [N, K]
            k = offset_pred.shape[1]
            s = point.num_points // num_samples

            # GT keypoint = mean of (point + gt_offset) over gt-mask>0 points
            gt_mask = batch["keypoint_mask"] * point.valid[:, None].astype(jnp.float32)  # [N, K]
            gt_cand = point.coord[:, None, :] + batch["keypoint_offset"]
            w = gt_mask.reshape(num_samples, s, k, 1)
            gt_kp = jnp.sum(gt_cand.reshape(num_samples, s, k, 3) * w, axis=1) / jnp.maximum(
                jnp.sum(w, axis=1), 1e-6
            )

            pred_arg = reconstruct_keypoints_from_offsets(
                point.coord, offset_pred, mask_prob, point.batch, point.valid, num_samples
            )
            pred_wtd = reconstruct_keypoints_weighted(
                point.coord, offset_pred, mask_prob, point.valid, num_samples, self.threshold
            )
            dist_arg = jnp.linalg.norm(pred_arg - gt_kp, axis=-1) * batch["scale"][:, None]
            dist_wtd = jnp.linalg.norm(pred_wtd - gt_kp, axis=-1) * batch["scale"][:, None]
            return (
                jnp.sum(dist_arg, axis=0),
                jnp.sum(dist_wtd, axis=0),
                jnp.asarray(num_samples, jnp.float32),
            )

        self._eval_step = jax.jit(eval_step, static_argnums=(2,))

    def after_epoch(self):
        if self.trainer.val_loader is None:
            return
        if self._eval_step is None:
            self._build()
        from ...parallel.mesh import shard_batch

        trainer = self.trainer
        logger = get_root_logger()
        sums = {"argmax": None, "weighted": None}
        count = 0.0
        for batch_np in trainer.val_loader:
            batch = shard_batch(batch_np, trainer.mesh)
            ns = batch.pop("num_samples", batch_np["num_samples"])
            da, dw, n = self._eval_step(trainer.state, batch, ns)
            for key, d in (("argmax", da), ("weighted", dw)):
                sums[key] = np.asarray(d) if sums[key] is None else sums[key] + np.asarray(d)
            count += float(n)
        means = {}
        for key, dist_sum in sums.items():
            per_kp = dist_sum / max(count, 1)
            means[key] = float(per_kp.mean())
            per_kp_str = " / ".join(f"{v:.1f}" for v in per_kp)
            logger.info(f"Keypoint mean distance [{key}]: {means[key]:.2f} (per-KP: {per_kp_str})")
        mean_dist = means[self.aggregate]
        logger.info(f"Val result: mean keypoint distance {mean_dist:.2f} ({self.aggregate})")
        trainer.storage.put_scalar("val/keypoint_dist", mean_dist)
        trainer.storage.put_scalar("val/keypoint_dist_weighted", means["weighted"])
        trainer.comm_info["current_metric_value"] = -mean_dist
        trainer.comm_info["current_metric_name"] = "neg_keypoint_dist"
