"""Headless batch keypoint predictor: raw scan dir -> per-scan keypoint txt.

Parity surface: reference `temp/batch_predict_keypoints.py:96-174` +
`tools/batch_infer_export_txt.py` — walk a directory of raw clouds (.npy N x
>=3, or .pcd ascii), featurize (normals + curvature) when the file has bare
xyz, run the global-regression or offset keypoint model, de-normalize, and
write one txt per scan with the predicted keypoint coordinates."""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pointcept_keypointdetection_tpu.inference.keypoint import (
    KeypointPredictor,
    OffsetKeypointPredictor,
    estimate_normals_curvature,
)
from pointcept_keypointdetection_tpu.utils.config import Config


def load_cloud(path):
    if path.endswith(".npy"):
        raw = np.load(path).astype(np.float32)
        coord = raw[:, :3]
        feat = raw[:, 3:] if raw.shape[1] > 3 else None
        return coord, feat
    if path.endswith(".pcd"):
        pts = []
        with open(path, errors="ignore") as f:
            data_started = False
            for line in f:
                if data_started:
                    parts = line.split()
                    if len(parts) >= 3:
                        pts.append([float(parts[0]), float(parts[1]), float(parts[2])])
                elif line.startswith("DATA"):
                    if "ascii" not in line:
                        raise ValueError(f"{path}: only ascii PCD supported")
                    data_started = True
        return np.asarray(pts, np.float32), None
    raise ValueError(f"unsupported cloud format: {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--weight", default=None)
    ap.add_argument("--scan-dir", required=True)
    ap.add_argument("--out-dir", default=None, help="default: alongside scans")
    ap.add_argument("--task", default="auto", choices=["auto", "keypoint", "offset_keypoint"])
    ap.add_argument("--method", default="argmax", choices=["argmax", "weighted"])
    ap.add_argument("--grid-size", type=float, default=0.02)
    ap.add_argument("--tag", default="model", help="suffix of the output txt name")
    args = ap.parse_args()

    cfg = Config.fromfile(args.config_file)
    task = args.task
    if task == "auto":
        task = "offset_keypoint" if "Offset" in cfg.model.type else "keypoint"
    cls = OffsetKeypointPredictor if task == "offset_keypoint" else KeypointPredictor
    predictor = cls(dict(cfg.model), checkpoint=args.weight)

    scans = sorted(glob.glob(os.path.join(args.scan_dir, "*.npy")) + glob.glob(os.path.join(args.scan_dir, "*.pcd")))
    print(f"{len(scans)} scans in {args.scan_dir}")
    out_dir = args.out_dir or args.scan_dir
    os.makedirs(out_dir, exist_ok=True)
    for path in scans:
        coord, feat = load_cloud(path)
        if feat is None:
            feat = estimate_normals_curvature(coord)
        if task == "offset_keypoint":
            kp = predictor.predict(coord, feat, grid_size=args.grid_size, method=args.method)
        else:
            kp = predictor.predict(coord, feat, grid_size=args.grid_size)
        stem = os.path.splitext(os.path.basename(path))[0]
        # reference naming: <scan>_关键点坐标预测结果_<model>.txt
        out = os.path.join(out_dir, f"{stem}_关键点坐标预测结果_{args.tag}.txt")
        np.savetxt(out, np.asarray(kp), fmt="%.3f")
        print(f"  {stem}: wrote {out}")


if __name__ == "__main__":
    main()
