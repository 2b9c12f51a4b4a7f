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


@HOOKS.register_module()
class OffsetKeypointEvaluator(HookBase):
    """For dense offset models emitting ``offset_pred`` [N,K,3] + ``mask_logits`` [N,K]."""

    def __init__(self):
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

            pred_kp = reconstruct_keypoints_from_offsets(
                point.coord, offset_pred, mask_prob, point.batch, point.valid, num_samples
            )
            dist = jnp.linalg.norm(pred_kp - gt_kp, axis=-1) * batch["scale"][:, None]
            return jnp.sum(dist, axis=0), jnp.asarray(num_samples, jnp.float32)

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
        for ki, v in enumerate(per_kp):
            logger.info(f"Keypoint_{ki} mean distance: {v:.2f}")
        logger.info(f"Val result: mean keypoint distance {mean_dist:.2f}")
        trainer.storage.put_scalar("val/keypoint_dist", mean_dist)
        trainer.comm_info["current_metric_value"] = -mean_dist
        trainer.comm_info["current_metric_name"] = "neg_keypoint_dist"
