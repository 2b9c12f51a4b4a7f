"""Gradient accumulation path of the trainer."""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_grad_accum_runs(tmp_path):
    from pointcept_keypointdetection_tpu.engines.defaults import default_config_parser
    from pointcept_keypointdetection_tpu.engines.train import TRAINERS
    from pointcept_keypointdetection_tpu.parallel.mesh import shard_batch

    cfg = default_config_parser(
        os.path.join(REPO, "configs", "synthetic", "semseg-spunet-mini.py"),
        options={
            "save_path": str(tmp_path / "exp"),
            "eval_epoch": 1,
            "slot_size": 512,
            "data.train.num_points": 800,
            "data.val.num_points": 800,
            "gradient_accumulation_steps": 2,
            "evaluate": False,
        },
    )
    trainer = TRAINERS.build({"type": "DefaultTrainer", "cfg": cfg})
    batch = next(iter(trainer.train_loader))
    ns = batch["num_samples"]
    bb = shard_batch(batch, trainer.mesh)
    bb.pop("num_samples", None)
    state, metrics = trainer._train_step(trainer.state, bb, ns)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
