"""Connected components, PointGroup clustering, and the AP evaluator."""

import jax.numpy as jnp
import numpy as np

from pointcept_keypointdetection_tpu.engines.hooks.insseg_evaluator import (
    associate_instances,
    evaluate_matches,
    summarize_ap,
)
from pointcept_keypointdetection_tpu.ops.cluster import connected_components


def test_connected_components_separates_blobs(rng):
    blob_a = rng.normal(0, 0.05, (50, 3)) + [0, 0, 0]
    blob_b = rng.normal(0, 0.05, (50, 3)) + [5, 0, 0]
    blob_c = rng.normal(0, 0.05, (50, 3)) + [0, 5, 0]
    coord = jnp.asarray(np.concatenate([blob_a, blob_b, blob_c]).astype(np.float32))
    classes = jnp.asarray(np.array([0] * 50 + [0] * 50 + [1] * 50, np.int32))
    valid = jnp.ones(150, bool)
    labels = np.asarray(connected_components(coord, classes, valid, radius=0.5, k=8))
    assert len(np.unique(labels[:50])) == 1
    assert len(np.unique(labels[50:100])) == 1
    assert len(np.unique(labels[100:])) == 1
    assert labels[0] != labels[50] and labels[0] != labels[100]


def test_connected_components_class_split(rng):
    # same location, different classes -> different components
    pts = rng.normal(0, 0.05, (40, 3)).astype(np.float32)
    coord = jnp.asarray(np.concatenate([pts, pts]))
    classes = jnp.asarray(np.array([0] * 40 + [1] * 40, np.int32))
    labels = np.asarray(connected_components(coord, classes, jnp.ones(80, bool), 0.5, k=8))
    assert labels[0] != labels[40]


def test_ap_perfect_predictions():
    n = 400
    segment = np.repeat([2, 3], n // 2)
    instance = np.repeat([0, 1, 2, 3], n // 4)
    masks = np.stack([instance == i for i in range(4)])
    classes = np.array([2, 2, 3, 3])
    scores = np.ones(4) * 0.9
    gt, pr = associate_instances(classes, scores, masks, segment, instance, 4, (-1, 0, 1))
    ap = evaluate_matches([dict(gt=gt, pr=pr)], [2, 3])
    all_ap, ap50, ap25 = summarize_ap(ap)
    assert all_ap == 1.0 and ap50 == 1.0 and ap25 == 1.0


def test_ap_half_wrong():
    n = 400
    segment = np.repeat([2], n)
    instance = np.repeat([0, 1], n // 2)
    # one perfect prediction, one totally wrong (off-instance) with lower conf
    masks = np.stack([instance == 0, np.zeros(n, bool)])
    masks[1, 200:350] = True  # 150/200 of instance 1 -> IoU 0.75
    classes = np.array([2, 2])
    scores = np.array([0.9, 0.8])
    gt, pr = associate_instances(classes, scores, masks, segment, instance, 4, (-1, 0, 1))
    ap = evaluate_matches([dict(gt=gt, pr=pr)], [2])
    all_ap, ap50, ap25 = summarize_ap(ap)
    assert ap25 == 1.0
    assert 0.4 < all_ap < 1.0  # high-IoU thresholds lose the partial mask
