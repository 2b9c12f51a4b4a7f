"""MultiDatasetTrainer round-robin + PPT condition plumbing."""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_multidataset_trainer(tmp_path):
    from pointcept_keypointdetection_tpu.engines.defaults import default_config_parser
    from pointcept_keypointdetection_tpu.engines.train import TRAINERS
    from pointcept_keypointdetection_tpu.utils.config import Config

    transform = [
        dict(type="GridSample", grid_size=0.05, mode="train", return_grid_coord=True),
        dict(type="NormalizeColor"),
        dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("coord", "color")),
    ]
    cfg = Config(
        dict(
            seed=1,
            save_path=str(tmp_path / "exp"),
            evaluate=False,
            batch_size=2,
            batch_size_val=None,
            slot_size=512,
            mix_prob=0.0,
            eval_epoch=1,
            clip_grad=None,
            amp=None,
            gradient_accumulation_steps=1,
            remat=False,
            model=dict(
                type="PPT-v1m2",
                conditions=("A", "B"),
                num_classes=(6, 4),
                context_channels=8,
                backbone=dict(
                    type="SpUNet-v1m1",
                    in_channels=6 + 8,
                    num_classes=0,
                    base_channels=8,
                    channels=(8, 16, 16, 16, 16, 16, 8, 8),
                    layers=(1,) * 8,
                    stem_kernel=3,
                ),
                criteria=[dict(type="CrossEntropyLoss")],
            ),
            optimizer=dict(type="AdamW", lr=2e-3),
            scheduler=dict(type="PolyLR", power=0.9),
            hooks=[dict(type="IterationTimer"), dict(type="InformationWriter"), dict(type="CheckpointSaver")],
            data=dict(
                num_classes=6,
                train=dict(
                    datasets=[
                        dict(type="SyntheticSemSegDataset", split="train", num_scenes=4,
                             num_points=700, num_classes=6, condition=0, transform=transform),
                        dict(type="SyntheticSemSegDataset", split="train", num_scenes=4,
                             num_points=700, num_classes=4, condition=1, seed=7, transform=transform),
                    ],
                ),
            ),
        )
    )
    trainer = TRAINERS.build({"type": "MultiDatasetTrainer", "cfg": cfg})
    assert len(trainer.train_loader) == 4  # 2 datasets x 2 batches each
    trainer.train()
    h = trainer.storage.histories() if trainer.storage else {}
    # completed all steps with finite losses
    assert int(trainer.state.step) == 4
