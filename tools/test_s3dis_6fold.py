"""S3DIS 6-fold cross-validation aggregation.

Parity surface: reference `tools/test_s3dis_6fold.py` — merge the per-area
confusion counts saved by per-fold SemSegTester runs and print the combined
mIoU/mAcc/allAcc.  Each fold run saves ``result/confusion_<area>.npz`` via
--options save_confusion=true (or pass explicit files).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--record-root", required=True, help="dir containing per-area confusion .npz files")
    args = parser.parse_args()

    files = sorted(glob.glob(os.path.join(args.record_root, "**", "confusion*.npz"), recursive=True))
    if not files:
        raise FileNotFoundError(f"no confusion files under {args.record_root}")
    inter = union = target = None
    for path in files:
        with np.load(path) as f:
            inter = f["intersection"] if inter is None else inter + f["intersection"]
            union = f["union"] if union is None else union + f["union"]
            target = f["target"] if target is None else target + f["target"]
        print(f"merged {path}")
    iou = inter / np.maximum(union, 1)
    acc = inter / np.maximum(target, 1)
    print(f"6-fold result: mIoU {iou.mean():.4f} mAcc {acc.mean():.4f} "
          f"allAcc {inter.sum() / max(target.sum(), 1):.4f}")
    for i, (a, b) in enumerate(zip(iou, acc)):
        print(f"Class_{i}: iou {a:.4f} acc {b:.4f}")


if __name__ == "__main__":
    main()
