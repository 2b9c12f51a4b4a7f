"""End-to-end keypoint training through the Trainer (config #2 smoke path)."""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_offset_keypoint_trainer(tmp_path):
    from pointcept_keypointdetection_tpu.engines.defaults import default_config_parser
    from pointcept_keypointdetection_tpu.engines.train import TRAINERS

    cfg = default_config_parser(
        os.path.join(REPO, "configs", "synthetic", "offset-keypoint-mini.py"),
        options={"save_path": str(tmp_path / "exp"), "eval_epoch": 2, "slot_size": 512,
                 "data.train.num_points": 700, "data.val.num_points": 700,
                 "data.train.loop": 4},
    )
    trainer = TRAINERS.build({"type": "DefaultTrainer", "cfg": cfg})
    trainer.train()
    # the evaluator published a (negated) mean keypoint distance
    assert trainer.best_metric_value > -1e9
    dist_mm = -trainer.best_metric_value
    assert np.isfinite(dist_mm) and dist_mm > 0
    # synthetic pigs are ~600 mm radius; untrained argmax reconstruction is
    # ~1200 mm — a briefly-trained model must do clearly better
    assert dist_mm < 800, dist_mm
    assert os.path.isfile(os.path.join(cfg.save_path, "model", "model_best.ckpt"))
