"""Training entry point.

Parity surface: `tools/train.py` of the reference —
``python tools/train.py --config-file configs/<ds>/<exp>.py --options k=v``.
Multi-host: launch one process per host with --num-processes/--process-id/
--coordinator (jax.distributed), instead of mp.spawn+NCCL.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pointcept_keypointdetection_tpu.engines.defaults import (
    default_argument_parser,
    default_config_parser,
    default_setup,
)
from pointcept_keypointdetection_tpu.engines.train import TRAINERS


def main():
    args = default_argument_parser().parse_args()
    if args.num_processes > 1:
        import jax

        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    cfg = default_config_parser(args.config_file, args.options)
    cfg = default_setup(cfg)
    trainer_cfg = dict(cfg.get("train", {"type": "DefaultTrainer"}))
    trainer_cfg["cfg"] = cfg
    trainer = TRAINERS.build(trainer_cfg)
    trainer.train()


if __name__ == "__main__":
    main()
