"""All shipped configs parse and reference registered components."""

import glob
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    p for p in glob.glob(os.path.join(REPO, "configs", "**", "*.py"), recursive=True)
    if "_base_" not in os.path.basename(os.path.dirname(p))
)


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.relpath(p, REPO) for p in CONFIGS])
def test_config_parses(path):
    from pointcept_keypointdetection_tpu.models import MODELS
    from pointcept_keypointdetection_tpu.utils.config import Config

    cfg = Config.fromfile(path)
    if "model" in cfg:
        assert cfg.model.type in MODELS, cfg.model.type
        # constructing the flax dataclasses catches bad kwargs without init
        MODELS.build(dict(cfg.model))
        for key in ("backbone", "backbone_conf"):
            sub = cfg.model.get(key)
            if isinstance(sub, dict) and "type" in sub:
                MODELS.build(dict(sub))
