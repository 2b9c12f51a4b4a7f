"""Classification / regression losses over padded point batches.

Parity surface: `pointcept/models/losses/misc.py` — CrossEntropyLoss,
SmoothCELoss, FocalLoss, BinaryFocalLoss, DiceLoss — plus the fork's
RegressionL1Loss (`losses/weight_regression_loss.py:24-38`).  All losses are
pure jnp, take an explicit ``valid`` mask, and reduce to a scalar.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .builder import LOSSES


def _masked_mean(values, mask):
    mask = mask.astype(values.dtype)
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _valid_and_not_ignored(target, ignore_index, valid):
    ok = target != ignore_index
    if valid is not None:
        ok = ok & valid
    return ok


@LOSSES.register_module()
class CrossEntropyLoss:
    def __init__(
        self,
        weight: Optional[Sequence[float]] = None,
        reduction: str = "mean",
        label_smoothing: float = 0.0,
        loss_weight: float = 1.0,
        ignore_index: int = -1,
    ):
        self.weight = None if weight is None else jnp.asarray(weight, jnp.float32)
        self.reduction = reduction
        self.label_smoothing = label_smoothing
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target, valid=None):
        num_classes = pred.shape[-1]
        ok = _valid_and_not_ignored(target, self.ignore_index, valid)
        tgt = jnp.where(ok, target, 0)
        logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        if self.label_smoothing > 0:
            smooth = -jnp.mean(logp, axis=-1)
            nll = (1.0 - self.label_smoothing) * nll + self.label_smoothing * smooth
        w = jnp.ones_like(nll)
        if self.weight is not None:
            w = jnp.take(self.weight, tgt)
        mask = ok.astype(jnp.float32) * w
        if self.reduction == "sum":
            loss = jnp.sum(nll * mask)
        else:
            loss = jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return self.loss_weight * loss


@LOSSES.register_module()
class SmoothCELoss(CrossEntropyLoss):
    def __init__(self, smoothing_ratio: float = 0.1, loss_weight: float = 1.0, ignore_index: int = -1):
        super().__init__(label_smoothing=smoothing_ratio, loss_weight=loss_weight, ignore_index=ignore_index)


@LOSSES.register_module()
class FocalLoss:
    """Multi-class focal loss (matches `losses/misc.py` FocalLoss semantics)."""

    def __init__(self, gamma: float = 2.0, alpha: float = 0.5, reduction: str = "mean", loss_weight: float = 1.0, ignore_index: int = -1):
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target, valid=None):
        # reference semantics (`losses/misc.py:97-173`): per-class SIGMOID
        # focal terms over one-hot targets, averaged over valid rows x classes
        ok = _valid_and_not_ignored(target, self.ignore_index, valid)
        tgt = jnp.where(ok, target, 0)
        k = pred.shape[-1]
        onehot = jax.nn.one_hot(tgt, k, dtype=jnp.float32)
        logits = pred.astype(jnp.float32)
        p = jax.nn.sigmoid(logits)
        ce = -(
            onehot * jax.nn.log_sigmoid(logits)
            + (1 - onehot) * jax.nn.log_sigmoid(-logits)
        )
        one_minus_pt = (1 - p) * onehot + p * (1 - onehot)
        focal_w = (self.alpha * onehot + (1 - self.alpha) * (1 - onehot)) * jnp.power(
            one_minus_pt, self.gamma
        )
        loss = ce * focal_w * ok[..., None]
        if self.reduction == "sum":
            return self.loss_weight * jnp.sum(loss)
        denom = jnp.maximum(jnp.sum(ok) * k, 1.0)
        return self.loss_weight * jnp.sum(loss) / denom


@LOSSES.register_module()
class BinaryFocalLoss:
    """Binary focal loss on logits (mask heads)."""

    def __init__(self, gamma: float = 2.0, alpha: float = 0.25, logits: bool = True, reduce: bool = True, loss_weight: float = 1.0):
        self.gamma = gamma
        self.alpha = alpha
        self.loss_weight = loss_weight

    def __call__(self, pred, target, valid=None):
        target = target.astype(jnp.float32)
        p = jax.nn.sigmoid(pred.astype(jnp.float32))
        ce = -(target * jax.nn.log_sigmoid(pred) + (1 - target) * jax.nn.log_sigmoid(-pred))
        pt = p * target + (1 - p) * (1 - target)
        alpha_t = self.alpha * target + (1 - self.alpha) * (1 - target)
        loss = alpha_t * jnp.power(1 - pt, self.gamma) * ce
        mask = jnp.ones_like(loss) if valid is None else jnp.broadcast_to(valid.reshape(valid.shape + (1,) * (loss.ndim - valid.ndim)), loss.shape)
        return self.loss_weight * _masked_mean(loss, mask)


@LOSSES.register_module()
class DiceLoss:
    def __init__(self, smooth: float = 1.0, exponent: float = 2.0, loss_weight: float = 1.0, ignore_index: int = -1):
        self.smooth = smooth
        self.exponent = exponent
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target, valid=None):
        num_classes = pred.shape[-1]
        ok = _valid_and_not_ignored(target, self.ignore_index, valid)
        tgt = jnp.where(ok, target, 0)
        prob = jax.nn.softmax(pred.astype(jnp.float32), axis=-1) * ok[..., None]
        onehot = jax.nn.one_hot(tgt, num_classes) * ok[..., None]
        total = 0.0
        for c in range(num_classes):
            num = 2.0 * jnp.sum(prob[..., c] * onehot[..., c]) + self.smooth
            den = jnp.sum(jnp.power(prob[..., c], self.exponent) + jnp.power(onehot[..., c], self.exponent)) + self.smooth
            total = total + (1.0 - num / den)
        return self.loss_weight * total / num_classes


@LOSSES.register_module()
class BCEWithLogitsLoss:
    def __init__(self, loss_weight: float = 1.0):
        self.loss_weight = loss_weight

    def __call__(self, pred, target, valid=None):
        target = target.astype(jnp.float32)
        loss = -(target * jax.nn.log_sigmoid(pred) + (1 - target) * jax.nn.log_sigmoid(-pred))
        mask = jnp.ones_like(loss) if valid is None else jnp.broadcast_to(valid.reshape(valid.shape + (1,) * (loss.ndim - valid.ndim)), loss.shape)
        return self.loss_weight * _masked_mean(loss, mask)


@LOSSES.register_module()
class MSELoss:
    def __init__(self, loss_weight: float = 1.0):
        self.loss_weight = loss_weight

    def __call__(self, pred, target, valid=None):
        loss = jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32))
        mask = jnp.ones_like(loss) if valid is None else jnp.broadcast_to(valid.reshape(valid.shape + (1,) * (loss.ndim - valid.ndim)), loss.shape)
        return self.loss_weight * _masked_mean(loss, mask)


@LOSSES.register_module()
class RegressionL1Loss:
    """Mean absolute error for k-dim regression targets (pig body measures,
    `losses/weight_regression_loss.py:24-38`)."""

    def __init__(self, loss_weight: float = 1.0):
        self.loss_weight = loss_weight

    def __call__(self, pred, target, valid=None):
        loss = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
        mask = jnp.ones_like(loss) if valid is None else jnp.broadcast_to(valid.reshape(valid.shape + (1,) * (loss.ndim - valid.ndim)), loss.shape)
        return self.loss_weight * _masked_mean(loss, mask)
