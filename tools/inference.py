"""Global-regression keypoint inference (single sample or whole split).

Parity surface: reference `tools/inference.py:192-450` — load a KeypointDataset
split, run the global-regression model, report per-keypoint mean/std L2 error
de-normalized to dataset units (mm for the pig benchmark), export a txt table,
optionally dump PLY visualizations (GT vs predicted keypoints; open3d's
sphere/cube viz becomes a PLY point dump since the image is headless).

Usage:
  python tools/inference.py --config-file configs/my_dataset/keypoint_ptv3.py \
      --weight exp/.../model_best.ckpt [--split val|all] [--index 0] [--out errors.txt]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pointcept_keypointdetection_tpu.datasets import build_dataset
from pointcept_keypointdetection_tpu.inference.keypoint import KeypointPredictor
from pointcept_keypointdetection_tpu.utils.config import Config
from pointcept_keypointdetection_tpu.utils.visualization import save_point_cloud


def run_split(predictor, dataset, grid_size, viz_dir=None):
    errors = []  # [num_samples, K]
    names = []
    for i in range(len(dataset.data_list)):
        info = dataset.data_list[i]
        coord, feat = dataset._load_cloud(info)
        gt = dataset._load_keypoints(info)
        if gt is None or coord.shape[0] == 0:
            continue
        pred = predictor.predict(coord, feat, grid_size=grid_size)  # dataset units
        err = np.linalg.norm(pred - gt, axis=-1)
        errors.append(err)
        names.append(info["name"])
        if viz_dir is not None:
            os.makedirs(viz_dir, exist_ok=True)
            pts = np.concatenate([coord, gt, pred], axis=0)
            color = np.zeros((len(pts), 3), np.uint8)
            color[: len(coord)] = (150, 150, 150)
            color[len(coord) : len(coord) + len(gt)] = (0, 255, 0)  # GT green
            color[len(coord) + len(gt) :] = (255, 0, 0)  # pred red
            save_point_cloud(os.path.join(viz_dir, f"{info['name']}.ply"), pts, color)
    return names, np.stack(errors) if errors else np.zeros((0, 0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--weight", default=None)
    ap.add_argument("--split", default="val", help="val | train | test | all")
    ap.add_argument("--index", type=int, default=None, help="single-sample mode")
    ap.add_argument("--grid-size", type=float, default=0.02)
    ap.add_argument("--out", default=None, help="txt error table path")
    ap.add_argument("--viz-dir", default=None, help="dump GT/pred PLYs here")
    args = ap.parse_args()

    cfg = Config.fromfile(args.config_file)
    predictor = KeypointPredictor(dict(cfg.model), checkpoint=args.weight)

    splits = ["train", "val", "test"] if args.split == "all" else [args.split]
    all_err = []
    lines = ["sample\t" + "\t".join(f"kp{i}" for i in range(cfg.model.get("num_keypoints", 6)))]
    for split in splits:
        data_cfg = dict(cfg.data.get(split) or cfg.data["train"])
        data_cfg["split"] = split
        data_cfg["transform"] = None
        dataset = build_dataset(data_cfg)
        if args.index is not None:
            dataset.data_list = dataset.data_list[args.index : args.index + 1]
        names, errors = run_split(predictor, dataset, args.grid_size, args.viz_dir)
        for name, err in zip(names, errors):
            lines.append(name + "\t" + "\t".join(f"{e:.2f}" for e in err))
        if len(errors):
            all_err.append(errors)
            print(f"[{split}] {len(errors)} samples")
            print("  per-KP mean:", np.round(errors.mean(0), 2))
            print("  per-KP std :", np.round(errors.std(0), 2))

    if all_err:
        total = np.concatenate(all_err)
        print(f"[total] mean={total.mean():.2f}  per-KP mean={np.round(total.mean(0), 2)}")
    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
