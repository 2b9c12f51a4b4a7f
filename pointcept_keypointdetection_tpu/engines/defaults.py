"""CLI defaults: argument parser, config-name protocol, setup.

Parity surface: `pointcept/engines/defaults.py` — ``default_argument_parser``
(--config-file / --options), ``default_config_parser`` (config-name protocol
``configs/<dataset>/<model-exp>.py`` -> ``exp/<dataset>/<exp>`` save path,
resume wiring, config snapshot dump), ``default_setup`` (seeding, logging).
The GPU/world-size batch scaling of the reference is replaced by mesh-aware
loaders (the global batch in config is the global batch).
"""

from __future__ import annotations

import argparse
import os

from ..utils.config import Config, DictAction
from ..utils.logger import get_root_logger


def default_argument_parser(epilog=None):
    parser = argparse.ArgumentParser(epilog=epilog or "TPU-native Pointcept-KeypointDetection")
    parser.add_argument(
        "--config-file", default="", metavar="FILE", help="path to config file"
    )
    parser.add_argument("--num-processes", type=int, default=1, help="jax processes (multi-host)")
    parser.add_argument("--process-id", type=int, default=0)
    parser.add_argument("--coordinator", default=None, help="jax.distributed coordinator address")
    parser.add_argument(
        "--options", nargs="+", action=DictAction, help="custom options, key=value"
    )
    return parser


def default_config_parser(file_path: str, options=None) -> Config:
    if os.path.isfile(file_path):
        cfg = Config.fromfile(file_path)
    else:
        raise FileNotFoundError(f"config not found: {file_path}")
    if options is not None:
        cfg.merge_from_dict(options)

    if cfg.get("seed", None) is None:
        cfg.seed = 4258 % (2**16)

    if not cfg.get("save_path"):
        # name protocol: configs/<dataset>/<model-exp>.py -> exp/<dataset>/<model-exp>
        experiment = os.path.splitext(os.path.basename(file_path))[0]
        dataset = os.path.basename(os.path.dirname(file_path))
        cfg.save_path = os.path.join("exp", dataset, experiment)
    os.makedirs(cfg.save_path, exist_ok=True)
    cfg.dump(os.path.join(cfg.save_path, "config.py"))
    return cfg


def default_setup(cfg: Config) -> Config:
    logger = get_root_logger(log_file=os.path.join(cfg.save_path, "train.log"))
    logger.info(f"Config:\n{cfg.pretty_text}")
    return cfg
