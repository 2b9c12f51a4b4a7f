"""Small shared utilities.

Parity surface: `pointcept/utils/misc.py` — ``AverageMeter``,
``intersection_and_union`` (the histogram-based IoU primitive used by every
semseg evaluator), and directory helpers.  Both numpy and jax.numpy variants of
the IoU histogram are provided; the jnp variant is jit-safe with static
``num_classes`` and feeds ``psum``-style metric reduction.
"""

from __future__ import annotations

import os

import numpy as np


class AverageMeter:
    """Track value/average/sum/count of a scalar stream."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def intersection_and_union(output, target, K, ignore_index=-1):
    """Per-class intersection / union / target histograms (numpy).

    Matches the reference semantics (`pointcept/utils/misc.py:37-49`): entries
    with ``target == ignore_index`` are excluded, outputs are length-K arrays
    (area_intersection, area_union, area_target).
    """
    output = np.asarray(output).reshape(-1).copy()
    target = np.asarray(target).reshape(-1).copy()
    assert output.shape == target.shape
    output[target == ignore_index] = ignore_index
    intersection = output[output == target]
    area_intersection, _ = np.histogram(intersection, bins=np.arange(K + 1))
    area_output, _ = np.histogram(output, bins=np.arange(K + 1))
    area_target, _ = np.histogram(target, bins=np.arange(K + 1))
    area_union = area_output + area_target - area_intersection
    return area_intersection, area_union, area_target


def intersection_and_union_jax(output, target, K: int, ignore_index: int = -1, valid_mask=None):
    """jit-safe per-class intersection/union/target counts.

    ``output``/``target`` are int arrays of any (matching) shape; entries where
    ``target == ignore_index`` or ``valid_mask`` is False are excluded.
    Returns three ``int32[K]`` arrays, suitable for cross-device ``psum``.
    """
    import jax.numpy as jnp

    output = output.reshape(-1)
    target = target.reshape(-1)
    valid = target != ignore_index
    if valid_mask is not None:
        valid = valid & valid_mask.reshape(-1)
    # Clamp invalid entries onto class 0 and subtract their weight via the mask.
    weights = valid.astype(jnp.int32)
    safe_target = jnp.where(valid, target, 0)
    safe_output = jnp.where(valid, output, 0)
    inter_sel = weights * (safe_output == safe_target).astype(jnp.int32)
    area_intersection = jnp.zeros(K, jnp.int32).at[safe_target].add(inter_sel)
    area_output = jnp.zeros(K, jnp.int32).at[safe_output].add(weights)
    area_target = jnp.zeros(K, jnp.int32).at[safe_target].add(weights)
    area_union = area_output + area_target - area_intersection
    return area_intersection, area_union, area_target


def make_dirs(path: str):
    os.makedirs(path, exist_ok=True)
