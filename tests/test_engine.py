"""End-to-end engine test: config -> trainer -> train -> eval -> checkpoint."""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def mini_cfg(tmp_path):
    from pointcept_keypointdetection_tpu.engines.defaults import default_config_parser

    cfg = default_config_parser(
        os.path.join(REPO, "configs", "synthetic", "semseg-spunet-mini.py"),
        options={"save_path": str(tmp_path / "exp"), "eval_epoch": 3, "slot_size": 1024,
                 "data.train.num_points": 1500, "data.val.num_points": 1500,
                 "model.backbone.bn_momentum": 0.2},
    )
    return cfg


def test_trainer_end_to_end(mini_cfg):
    from pointcept_keypointdetection_tpu.engines.train import TRAINERS

    trainer = TRAINERS.build({"type": "DefaultTrainer", "cfg": mini_cfg})
    trainer.train()

    # training improved over random (6 classes -> random mIoU ~ small; the
    # synthetic scenes are near-trivially separable by geometry)
    miou = trainer.storage.history("val/mIoU").latest if "val/mIoU" in trainer.storage.histories() else None
    # storage is reset after epochs; read best metric from trainer instead
    assert trainer.best_metric_value > 0.2, trainer.best_metric_value

    ckpt = os.path.join(mini_cfg.save_path, "model", "model_last.ckpt")
    assert os.path.isfile(ckpt)
    best = os.path.join(mini_cfg.save_path, "model", "model_best.ckpt")
    assert os.path.isfile(best)


def test_trainer_resume(mini_cfg):
    from pointcept_keypointdetection_tpu.engines.train import TRAINERS

    trainer = TRAINERS.build({"type": "DefaultTrainer", "cfg": mini_cfg})
    trainer.train()
    step_after = int(trainer.state.step)

    mini_cfg.resume = True
    mini_cfg.eval_epoch = 4
    trainer2 = TRAINERS.build({"type": "DefaultTrainer", "cfg": mini_cfg})
    trainer2.train()  # CheckpointLoader restores state in before_train
    assert trainer2.start_epoch == 3  # resumed, trained exactly 1 extra epoch
    assert int(trainer2.state.step) > step_after
