"""PointGroup instance segmentation.

Capability parity with `pointcept/models/point_group/point_group_v1m1_base.py`:
backbone -> semantic logits + per-point center-shift ("offset") vectors;
losses = semantic CE (+ optional lovasz) + masked L1 offset-norm loss +
direction-cosine loss; inference clusters the center-shifted coordinates via
connected components (the CUDA ballquery+bfs_cluster of
`point_group_v1m1_base.py:120-140` replaced by
`ops/cluster.connected_components`) and scores each proposal by the mean
softmax confidence of its majority class over member points
(`point_group_v1m1_base.py:159-176` — this fork's v1m1 has no ScoreNet;
scoring parity is with its confidence-mean rule).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .builder import MODELS, build_model
from .losses import build_criteria
from .structure import PointBatch


@MODELS.register_module("PG-v1m1")
# v1m2 (`point_group_v1m2_ptv3.py`) is the same dual-decode clustering with a
# PTv3 backbone — the backbone here is config-driven, so one class covers both.
@MODELS.register_module("PG-v1m2")
class PointGroup(nn.Module):
    backbone: Dict[str, Any]
    criteria: Sequence[Dict[str, Any]] = (dict(type="CrossEntropyLoss"),)
    backbone_out_channels: int = 64
    semantic_num_classes: int = 20
    semantic_ignore_index: int = -1
    segment_ignore_index: Sequence[int] = (-1, 0, 1)
    instance_ignore_index: int = -1
    cluster_thresh: float = 1.5
    voxel_size: float = 0.02

    @nn.compact
    def __call__(self, point: PointBatch, batch: Dict[str, jnp.ndarray], train: bool = False):
        feat = build_model(dict(self.backbone))(point, train=train)
        c = self.backbone_out_channels
        seg_logits = nn.Dense(self.semantic_num_classes, name="seg_head")(feat)
        x = nn.Dense(c, name="offset_fc")(feat)
        x = nn.LayerNorm(name="offset_norm")(x)
        x = nn.relu(x)
        bias_shift = nn.Dense(3, name="offset_head")(x)  # per-point shift to instance center

        out = {"seg_logits": seg_logits, "bias_pred": bias_shift}
        if "instance_centroid" in batch and "segment" in batch:
            crit = build_criteria([dict(cc) for cc in self.criteria])
            loss_seg = crit(seg_logits, batch["segment"], valid=point.valid)

            instance = batch["instance"]
            mask = (instance != self.instance_ignore_index) & point.valid
            gt_bias = batch["instance_centroid"] - point.coord  # [N, 3]
            diff = bias_shift.astype(jnp.float32) - gt_bias
            w = mask.astype(jnp.float32)
            loss_bias = jnp.sum(jnp.abs(diff).sum(-1) * w) / jnp.maximum(jnp.sum(w), 1.0)

            gt_norm = jnp.linalg.norm(gt_bias, axis=-1)
            pred_norm = jnp.linalg.norm(bias_shift.astype(jnp.float32), axis=-1)
            cosine = jnp.sum(bias_shift * gt_bias, axis=-1) / jnp.maximum(gt_norm * pred_norm, 1e-8)
            loss_dir = jnp.sum((1.0 - cosine) * w) / jnp.maximum(jnp.sum(w), 1.0)

            out["loss"] = loss_seg + loss_bias + loss_dir
            out["loss_seg"] = loss_seg
            out["loss_bias"] = loss_bias
            out["loss_dir"] = loss_dir
        return out


def cluster_proposals(
    coord,
    seg_pred,
    bias_pred,
    valid,
    batch=None,
    cluster_thresh: float = 0.03,
    segment_ignore_index: Tuple[int, ...] = (-1, 0, 1),
    min_points: int = 50,
    dual: bool = False,
):
    """Cluster the center-shifted coordinates -> instance labels int32[N]
    (-1 = background), dropping clusters under ``min_points``.

    Matches the fork's v1m1 inference (`point_group_v1m1_base.py:103-140`):
    one ballquery+BFS pass over ``coord + bias_pred`` restricted to
    non-ignored predicted classes.  ``dual=True`` additionally clusters the
    ORIGINAL coordinates and fills uncovered points from those clusters (the
    original PointGroup paper's dual-set variant — not used by the fork).
    """
    import numpy as np

    from ..ops.cluster import connected_components

    ignore = tuple(int(i) for i in segment_ignore_index)
    # copy: np.asarray of a jax array is a read-only view, and the
    # small-cluster cull below writes in place
    labels = np.array(
        connected_components(
            coord + bias_pred, seg_pred, valid, cluster_thresh, batch=batch, ignore_classes=ignore
        )
    )
    if dual:
        lab_a = np.asarray(
            connected_components(
                coord, seg_pred, valid, cluster_thresh, batch=batch, ignore_classes=ignore
            )
        )
        offset = labels.max() + 1 if labels.max() >= 0 else 0
        fill = (labels < 0) & (lab_a >= 0)
        labels = labels.copy()
        labels[fill] = lab_a[fill] + offset
    # drop tiny clusters (`cluster_min_points`)
    uniq, counts = np.unique(labels[labels >= 0], return_counts=True)
    small = set(uniq[counts < min_points].tolist())
    if small:
        labels[np.isin(labels, list(small))] = -1
    return labels


def proposals_from_labels(
    labels,
    seg_pred,
    seg_probs=None,
    propose_points: int = 0,
):
    """Cluster labels -> (masks [P, N] bool, classes [P], scores [P]).

    Scoring follows `point_group_v1m1_base.py:150-176`: a proposal's class is
    the majority predicted segment of its members and its score the mean
    softmax confidence of that class over the members (cluster size fraction
    when no probabilities are given); proposals smaller than
    ``propose_points`` are dropped (`cluster_propose_points`).
    """
    import numpy as np

    labels = np.asarray(labels)
    seg_pred = np.asarray(seg_pred)
    uniq = np.unique(labels[labels >= 0])
    masks, classes, scores = [], [], []
    for u in uniq:
        m = labels == u
        if propose_points and m.sum() <= propose_points:
            continue
        cls = np.bincount(seg_pred[m]).argmax()
        if seg_probs is not None:
            score = float(np.asarray(seg_probs)[m, cls].mean())
        else:
            score = float(m.sum()) / max(len(labels), 1)
        masks.append(m)
        classes.append(int(cls))
        scores.append(score)
    if not masks:
        n = len(labels)
        return np.zeros((0, n), bool), np.zeros(0, int), np.zeros(0)
    return np.stack(masks), np.asarray(classes, int), np.asarray(scores)
