"""Offset-keypoint batch inference + error statistics.

Parity surface: reference `tools/infer_offset.py` — batch inference over a
directory of clouds with GT keypoints, per-keypoint aggregation
(argmax/weighted), de-normalization, per-keypoint mean/std error report and
txt export.  (The o3d interactive visualization of the reference is replaced
by PLY dumps via utils/visualization.)
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--weight", default=None)
    parser.add_argument("--data-root", required=True, help="dir with pointclouds/ and keypoints/")
    parser.add_argument("--split", default="val")
    parser.add_argument("--method", default="argmax", choices=["argmax", "weighted"])
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--grid-size", type=float, default=0.02)
    parser.add_argument("--slot-size", type=int, default=8192)
    parser.add_argument("--output", default=None, help="txt output path")
    args = parser.parse_args()

    from pointcept_keypointdetection_tpu.inference import OffsetKeypointPredictor
    from pointcept_keypointdetection_tpu.utils.config import Config

    cfg = Config.fromfile(args.config_file)
    weight = args.weight or os.path.join(cfg.save_path or ".", "model", "model_best.ckpt")
    predictor = OffsetKeypointPredictor(dict(cfg.model), checkpoint=weight, slot_size=args.slot_size)

    split_path = os.path.join(args.data_root, args.split)
    errors = []
    lines = []
    for cloud_path in sorted(glob.glob(os.path.join(split_path, "pointclouds", "*.npy"))):
        name = os.path.splitext(os.path.basename(cloud_path))[0]
        raw = np.nan_to_num(np.load(cloud_path).astype(np.float32))
        coord, feat = raw[:, :3], raw[:, 3:]
        pred = predictor.predict(
            coord, feat if feat.shape[1] else None, args.grid_size, args.method, args.threshold
        )
        lines.append(name + " " + " ".join(f"{v:.3f}" for v in pred.reshape(-1)))
        for kp_file in (f"{name}_关键点坐标.npy", f"{name}.npy"):
            kp_path = os.path.join(split_path, "keypoints", kp_file)
            if os.path.exists(kp_path):
                gt = np.load(kp_path).astype(np.float32).reshape(-1, 3)
                errors.append(np.linalg.norm(pred - gt, axis=1))
                break

    if errors:
        errors = np.stack(errors)  # [num_samples, K]
        mean, std = errors.mean(0), errors.std(0)
        print("Per-keypoint mean error:", " ".join(f"{v:.2f}" for v in mean))
        print("Per-keypoint std  error:", " ".join(f"{v:.2f}" for v in std))
        print(f"Overall mean error: {errors.mean():.2f}")
    if args.output:
        with open(args.output, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
