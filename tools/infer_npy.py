"""Single-file pig semseg inference: .npy cloud -> colored PLY + extracted pig.

Parity surface: reference `tools/infer_npy.py` — read an (N, >=7) cloud,
preprocess exactly like PigDataset (NaN cull, median centering, 5 m outlier
cull in mm units), run the segmentor, and write:
  * the full scene colored by prediction (background red, pig blue), and
  * a pig-only cloud (``preds == 1``).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pointcept_keypointdetection_tpu.utils.config import Config
from pointcept_keypointdetection_tpu.utils.visualization import save_point_cloud


def preprocess(raw: np.ndarray, outlier_mm: float = 5000.0):
    """PigDataset semantics (`pigseg.py:19-37`): NaN cull, median center,
    distance cull."""
    finite = np.isfinite(raw).all(axis=1)
    raw = raw[finite]
    coord = raw[:, :3]
    coord = coord - np.median(coord, axis=0)
    keep = np.linalg.norm(coord, axis=1) < outlier_mm
    return coord[keep], raw[keep, 3:7] if raw.shape[1] >= 7 else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("npy_path")
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--weight", default=None)
    ap.add_argument("--grid-size", type=float, default=0.02, help="in normalized units")
    ap.add_argument("--slot-size", type=int, default=32768)
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args()

    raw = np.load(args.npy_path).astype(np.float32)
    coord, feat = preprocess(raw)
    print(f"{len(raw)} raw points -> {len(coord)} after cleanup")

    from tools.serve import _SegPredictor  # same predictor as the HTTP server

    cfg = Config.fromfile(args.config_file)
    predictor = _SegPredictor(cfg, args.weight, args.slot_size)
    preds = predictor.predict(coord, feat, grid_size=args.grid_size).astype(np.int32)

    out_dir = args.out_dir or os.path.dirname(os.path.abspath(args.npy_path))
    stem = os.path.splitext(os.path.basename(args.npy_path))[0]
    color = np.where(preds[:, None] == 1, (60, 60, 255), (255, 60, 60)).astype(np.uint8)
    scene_path = os.path.join(out_dir, f"{stem}_pred.ply")
    save_point_cloud(scene_path, coord, color)
    pig = coord[preds == 1]
    pig_path = os.path.join(out_dir, f"{stem}_pig_only.ply")
    save_point_cloud(pig_path, pig, np.full((len(pig), 3), (60, 60, 255), np.uint8))
    print(f"wrote {scene_path} ({len(coord)} pts) and {pig_path} ({len(pig)} pts)")


if __name__ == "__main__":
    main()
