"""Lovász-Softmax loss (jnp re-implementation).

Parity surface: `pointcept/models/losses/lovasz.py` — the multi-class
Lovász-softmax over all points, ``classes="present"`` semantics.  The sort is
a static full-length sort; ignored/invalid points carry zero error and zero
ground truth, so they contribute nothing to the Lovász extension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .builder import LOSSES


def _lovasz_grad(gt_sorted):
    """Gradient of the Lovász extension w.r.t. sorted (desc) binary gt errors."""
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1.0)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


@LOSSES.register_module()
class LovaszLoss:
    def __init__(self, mode: str = "multiclass", loss_weight: float = 1.0, ignore_index: int = -1):
        assert mode in ("multiclass", "binary")
        self.mode = mode
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target, valid=None):
        ok = target != self.ignore_index
        if valid is not None:
            ok = ok & valid
        okf = ok.astype(jnp.float32)

        if self.mode == "binary":
            signs = 2.0 * target.astype(jnp.float32) - 1.0
            errors = jnp.maximum(1.0 - pred.astype(jnp.float32) * signs, 0.0) * okf
            order = jnp.argsort(-errors)
            gt_sorted = jnp.take(target.astype(jnp.float32) * okf, order)
            return self.loss_weight * jnp.dot(jnp.take(errors, order), _lovasz_grad(gt_sorted))

        num_classes = pred.shape[-1]
        prob = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
        tgt = jnp.where(ok, target, 0)
        losses = []
        presents = []
        for c in range(num_classes):
            fg = (tgt == c).astype(jnp.float32) * okf
            errors = jnp.abs(fg - prob[:, c]) * okf
            order = jnp.argsort(-errors)
            gt_sorted = jnp.take(fg, order)
            losses.append(jnp.dot(jnp.take(errors, order), _lovasz_grad(gt_sorted)))
            presents.append((jnp.sum(fg) > 0).astype(jnp.float32))
        losses = jnp.stack(losses)
        presents = jnp.stack(presents)
        return self.loss_weight * jnp.sum(losses * presents) / jnp.maximum(jnp.sum(presents), 1.0)
