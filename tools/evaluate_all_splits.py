"""Evaluate precision/recall/IoU across train/val/test splits.

Parity surface: reference `tools/evaluate_all_splits.py` — runs the SemSeg
tester over every configured split and prints a combined table.
"""

import argparse
import copy
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--weight", default=None)
    parser.add_argument("--splits", nargs="+", default=["train", "val"])
    args = parser.parse_args()

    from pointcept_keypointdetection_tpu.engines.defaults import default_config_parser
    from pointcept_keypointdetection_tpu.engines.test import TESTERS

    results = {}
    for split in args.splits:
        cfg = default_config_parser(args.config_file, {"weight": args.weight} if args.weight else None)
        test_cfg = copy.deepcopy(dict(cfg.data.get("test", cfg.data.val)))
        test_cfg["split"] = split
        cfg.data.test = test_cfg
        tester_cfg = dict(cfg.get("test", {"type": "SemSegTester"}))
        tester_cfg["cfg"] = cfg
        tester = TESTERS.build(tester_cfg)
        results[split] = tester.test()

    print("\n=== All-split summary ===")
    for split, r in results.items():
        print(split, " ".join(f"{k}={v:.4f}" for k, v in r.items()))


if __name__ == "__main__":
    main()
