"""Eval-from-committed-checkpoint keypoint regression (VERDICT r2 item 6).

The round-3 trained offset-keypoint model (configs/synthetic/
offset-keypoint-r3.py, seed 42, 64 epochs) reached 3.28 mm weighted /
7.26 mm argmax mean keypoint distance on the synthetic-pig val set — the
reference's real-pig regime is 13.15–22.15 mm
(`results/batch_keypoint_errors.svg`).  This test reloads the committed
params-only checkpoint (exp/kp_r3/model_params.ckpt) and re-evaluates the
val pigs through the same reconstruction chain
(`hooks/offset_keypoint_evaluator.py:59-92` semantics), pinning the result so
regressions in the model, data pipeline, or evaluator surface here —
the odometry regression test (tests/test_slam.py) is the template.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "exp", "kp_r3", "model_params.ckpt")


@pytest.mark.skipif(not os.path.exists(CKPT), reason="trained checkpoint not present")
def test_keypoint_eval_from_committed_checkpoint():
    from pointcept_keypointdetection_tpu.datasets import build_dataset
    from pointcept_keypointdetection_tpu.datasets.collate import collate
    from pointcept_keypointdetection_tpu.engines.common import build_point_batch
    from pointcept_keypointdetection_tpu.engines.hooks.keypoint_evaluator import (
        reconstruct_keypoints_from_offsets,
        reconstruct_keypoints_weighted,
    )
    from pointcept_keypointdetection_tpu.models import build_model
    from pointcept_keypointdetection_tpu.utils.checkpoint import load_checkpoint
    from pointcept_keypointdetection_tpu.utils.config import Config

    cfg = Config.fromfile(os.path.join(REPO, "configs", "synthetic", "offset-keypoint-r3.py"))
    model = build_model(dict(cfg.model))
    ck = load_checkpoint(CKPT)
    variables = {"params": ck["params"], "batch_stats": ck["batch_stats"]}

    ds = build_dataset(dict(cfg.data.val))
    slot = int(cfg.slot_size)
    dist_w_sum = np.zeros(6)
    dist_a_sum = np.zeros(6)
    count = 0
    for i in range(len(ds)):
        batch = collate([ds[i]], slot)
        batch = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, (str, list))}
        point = build_point_batch(batch, 1)
        out = model.apply(variables, point, batch, train=False)
        offset_pred = out["offset_pred"]
        mask_prob = jax.nn.sigmoid(out["mask_logits"])
        s = point.num_points
        gt_mask = batch["keypoint_mask"] * point.valid[:, None].astype(jnp.float32)
        gt_cand = point.coord[:, None, :] + batch["keypoint_offset"]
        w = gt_mask.reshape(1, s, 6, 1)
        gt_kp = jnp.sum(gt_cand.reshape(1, s, 6, 3) * w, axis=1) / jnp.maximum(
            jnp.sum(w, axis=1), 1e-6
        )
        pred_w = reconstruct_keypoints_weighted(
            point.coord, offset_pred, mask_prob, point.valid, 1
        )
        pred_a = reconstruct_keypoints_from_offsets(
            point.coord, offset_pred, mask_prob, None, point.valid, 1
        )
        scale = float(np.asarray(batch["scale"]).reshape(-1)[0])
        dist_w_sum += np.asarray(jnp.linalg.norm(pred_w - gt_kp, axis=-1))[0] * scale
        dist_a_sum += np.asarray(jnp.linalg.norm(pred_a - gt_kp, axis=-1))[0] * scale
        count += 1

    mean_w = float(dist_w_sum.mean() / count)
    mean_a = float(dist_a_sum.mean() / count)
    # trained run: 3.28 mm weighted / 7.26 mm argmax; generous regression
    # bounds still far below the 13.15 mm best reference keypoint
    assert mean_w < 6.0, mean_w
    assert mean_a < 11.0, mean_a
