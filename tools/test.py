"""Testing entry point (parity: reference `tools/test.py`)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pointcept_keypointdetection_tpu.engines.defaults import (
    default_argument_parser,
    default_config_parser,
    default_setup,
)
from pointcept_keypointdetection_tpu.engines.test import TESTERS


def main():
    args = default_argument_parser().parse_args()
    cfg = default_config_parser(args.config_file, args.options)
    cfg = default_setup(cfg)
    tester_cfg = dict(cfg.get("test", {"type": "SemSegTester"}))
    tester_cfg["cfg"] = cfg
    tester = TESTERS.build(tester_cfg)
    tester.test()


if __name__ == "__main__":
    main()
