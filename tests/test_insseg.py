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


def test_associate_batch_splits_collated_scenes():
    """Two collated scenes with COLLIDING scene-local instance ids: per-sample
    association must give mAP 1.0 for oracle predictions; the old whole-batch
    association fused same-id instances across scenes (regression: training
    logs said mAP 0.017 where the per-scene tester measured 0.739)."""
    from pointcept_keypointdetection_tpu.engines.hooks.insseg_evaluator import (
        associate_batch,
    )

    n = 300  # per scene
    # both scenes: one class-2 instance with local id 0 at different places
    segment = np.full(2 * n, 2, np.int32)
    instance = np.zeros(2 * n, np.int32)  # id 0 in BOTH scenes
    batch_ids = np.repeat([0, 1], n)
    valid = np.ones(2 * n, bool)
    # oracle proposals: one mask per scene
    masks = np.stack([batch_ids == 0, batch_ids == 1])
    classes = np.array([2, 2])
    scores = np.array([0.9, 0.9])

    scenes = associate_batch(
        masks, classes, scores, valid, batch_ids, segment, instance,
        num_samples=2, num_classes=4, segment_ignore_index=(-1, 0, 1),
    )
    assert len(scenes) == 2
    ap = evaluate_matches(scenes, [2])
    all_ap, ap50, ap25 = summarize_ap(ap)
    assert all_ap == 1.0 and ap50 == 1.0 and ap25 == 1.0

    # the failure mode being guarded: whole-batch association sees ONE gt
    # instance (id 0, 600 pts) while each oracle mask covers half -> IoU 0.5
    from pointcept_keypointdetection_tpu.engines.hooks.insseg_evaluator import (
        associate_instances,
    )

    gt, pr = associate_instances(
        classes, scores, masks, segment, instance, 4, (-1, 0, 1)
    )
    fused = evaluate_matches([dict(gt=gt, pr=pr)], [2])
    fused_map, _, _ = summarize_ap(fused)
    assert fused_map < 0.5


def test_insseg_tester_end_to_end(tmp_path):
    """InsSegTester with an oracle forward: perfect semantics + shifts -> mAP 1.

    Exercises the full tester path (padding, clustering, proposal scoring,
    1-nn map-to-origin, AP aggregation) without training a model.
    """
    import os

    import jax

    from pointcept_keypointdetection_tpu.engines.test import InsSegTester
    from pointcept_keypointdetection_tpu.utils.config import Config

    rng = np.random.default_rng(0)
    scenes = []
    for si in range(2):
        blobs, seg, inst = [], [], []
        for ii, (cls, center) in enumerate(
            [(2, [0, 0, 0.5]), (2, [3, 0, 0.5]), (3, [0, 3, 0.5])]
        ):
            pts = rng.normal(0, 0.15, (300, 3)) + center
            blobs.append(pts)
            seg += [cls] * 300
            inst += [ii] * 300
        floor = np.stack(
            [rng.uniform(-1, 4, 400), rng.uniform(-1, 4, 400), rng.normal(0, 0.01, 400)], 1
        )
        blobs.append(floor)
        seg += [0] * 400
        inst += [-1] * 400
        coord = np.concatenate(blobs).astype(np.float32)
        segment = np.asarray(seg, np.int32)
        instance = np.asarray(inst, np.int32)
        # "origin" = 2x duplicated noisy copies of every point
        origin_coord = np.repeat(coord, 2, 0) + rng.normal(0, 0.005, (2 * len(coord), 3)).astype(
            np.float32
        )
        scenes.append(
            dict(
                coord=coord,
                grid_coord=np.floor(coord / 0.02).astype(np.int32) + 100,
                feat=coord.copy(),
                segment=segment,
                instance=instance,
                origin_coord=origin_coord.astype(np.float32),
                origin_segment=np.repeat(segment, 2),
                origin_instance=np.repeat(instance, 2),
                name=f"scene{si}",
            )
        )

    cfg = Config(
        dict(
            save_path=str(tmp_path),
            slot_size=2048,
            data=dict(num_classes=4, names=["wall", "floor", "box", "ball"]),
            model=dict(backbone=dict(in_channels=3)),
        )
    )
    tester = InsSegTester(
        cfg,
        segment_ignore_index=(-1, 0, 1),
        cluster_thresh=0.06,
        model=object(),
        variables={"params": {}},
        test_loader=scenes,
    )

    def oracle_forward(variables, batch):
        segment = np.asarray(batch["segment"]).reshape(-1)
        instance = np.asarray(batch["instance"]).reshape(-1)
        coord = np.asarray(batch["coord"])
        valid = np.asarray(batch["valid"]).reshape(-1)
        n = len(segment)
        probs = np.full((n, 4), 0.01, np.float32)
        probs[np.arange(n), np.maximum(segment, 0)] = 0.97
        bias = np.zeros((n, 3), np.float32)
        for u in np.unique(instance[instance >= 0]):
            m = (instance == u) & valid
            bias[m] = coord[m & valid].mean(0) - coord[m]
        seg_pred = probs.argmax(1).astype(np.int32)
        return jnp.asarray(seg_pred), jnp.asarray(bias), jnp.asarray(probs)

    tester._forward = oracle_forward
    result = tester.test()
    assert result["mAP"] == 1.0 and result["AP50"] == 1.0 and result["AP25"] == 1.0, result
