"""Validation evaluator hooks.

Parity surface: `pointcept/engines/hooks/evaluator.py` — ``SemSegEvaluator``
(mIoU/mAcc/allAcc via intersection_and_union + cross-rank reduction, metric
published to ``trainer.comm_info`` for CheckpointSaver) and ``ClsEvaluator``.
The per-batch counting runs as one jitted function on the mesh; host
accumulates the K-length count vectors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.logger import get_root_logger
from ...utils.misc import intersection_and_union_jax
from ..common import build_point_batch
from .builder import HOOKS
from .default import HookBase


@HOOKS.register_module()
class SemSegEvaluator(HookBase):
    def __init__(self, num_classes=None, ignore_index=-1):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self._eval_step = None

    def _build(self):
        trainer = self.trainer
        model = trainer.model
        num_classes = self.num_classes or trainer.cfg.data.get("num_classes")
        ignore = self.ignore_index

        def eval_step(state, batch, num_samples: int):
            point = build_point_batch(batch, num_samples)
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                point,
                batch,
                train=False,
            )
            logits = out["seg_logits"]
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            inter, union, target = intersection_and_union_jax(
                pred, batch["segment"], num_classes, ignore, point.valid
            )
            loss = out.get("loss", jnp.zeros((), jnp.float32))
            return inter, union, target, loss

        self._eval_step = jax.jit(eval_step, static_argnums=(2,))
        self._num_classes = num_classes

    def after_epoch(self):
        if self.trainer.val_loader is None:
            return
        if self._eval_step is None:
            self._build()
        self.eval()

    def eval(self):
        from ...parallel.mesh import shard_batch

        trainer = self.trainer
        logger = get_root_logger()
        logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        K = self._num_classes
        inter_sum = np.zeros(K)
        union_sum = np.zeros(K)
        target_sum = np.zeros(K)
        losses = []
        for i, batch_np in enumerate(trainer.val_loader):
            batch = shard_batch(batch_np, trainer.mesh)
            ns = batch.pop("num_samples", batch_np["num_samples"])
            inter, union, target, loss = self._eval_step(trainer.state, batch, ns)
            inter_sum += np.asarray(inter)
            union_sum += np.asarray(union)
            target_sum += np.asarray(target)
            losses.append(float(loss))

        iou_class = inter_sum / np.maximum(union_sum, 1)
        acc_class = inter_sum / np.maximum(target_sum, 1)
        m_iou = float(np.mean(iou_class))
        m_acc = float(np.mean(acc_class))
        all_acc = float(inter_sum.sum() / np.maximum(target_sum.sum(), 1))
        logger.info(
            "Val result: mIoU/mAcc/allAcc {:.4f}/{:.4f}/{:.4f}.".format(m_iou, m_acc, all_acc)
        )
        for c in range(K):
            logger.info(
                f"Class_{c} Result: iou/accuracy {iou_class[c]:.4f}/{acc_class[c]:.4f}"
            )
        trainer.storage.put_scalar("val/loss", float(np.mean(losses)) if losses else 0.0)
        trainer.storage.put_scalar("val/mIoU", m_iou)
        trainer.storage.put_scalar("val/mAcc", m_acc)
        trainer.storage.put_scalar("val/allAcc", all_acc)
        trainer.comm_info["current_metric_value"] = m_iou
        trainer.comm_info["current_metric_name"] = "mIoU"
        logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")


@HOOKS.register_module()
class ClsEvaluator(HookBase):
    def __init__(self, num_classes=None):
        self.num_classes = num_classes
        self._eval_step = None

    def _build(self):
        trainer = self.trainer
        model = trainer.model
        num_classes = self.num_classes or trainer.cfg.data.get("num_classes")

        def eval_step(state, batch, num_samples: int):
            point = build_point_batch(batch, num_samples)
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats}, point, batch, train=False
            )
            pred = jnp.argmax(out["cls_logits"], axis=-1).astype(jnp.int32)
            target = batch["category"].reshape(-1)
            inter, union, tgt = intersection_and_union_jax(pred, target, num_classes, -1)
            return inter, union, tgt

        self._eval_step = jax.jit(eval_step, static_argnums=(2,))
        self._num_classes = num_classes

    def after_epoch(self):
        if self.trainer.val_loader is None:
            return
        if self._eval_step is None:
            self._build()
        from ...parallel.mesh import shard_batch

        trainer = self.trainer
        logger = get_root_logger()
        K = self._num_classes
        inter_sum = np.zeros(K)
        union_sum = np.zeros(K)
        target_sum = np.zeros(K)
        for batch_np in trainer.val_loader:
            batch = shard_batch(batch_np, trainer.mesh)
            ns = batch.pop("num_samples", batch_np["num_samples"])
            inter, union, tgt = self._eval_step(trainer.state, batch, ns)
            inter_sum += np.asarray(inter)
            union_sum += np.asarray(union)
            target_sum += np.asarray(tgt)
        all_acc = float(inter_sum.sum() / np.maximum(target_sum.sum(), 1))
        logger.info(f"Val result: allAcc {all_acc:.4f}")
        trainer.comm_info["current_metric_value"] = all_acc
        trainer.comm_info["current_metric_name"] = "allAcc"
