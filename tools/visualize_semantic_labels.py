"""Visualize SemanticKITTI scans with (official or predicted) labels.

Parity surface: `SemanticFAST-LIO2-prediction/visualize_official_labels.py`
(single-frame colored cloud) and `visualize_semantic_video.py` (streaming
sequence viewer via Rerun).  This build writes per-frame colored PLY clouds
(any viewer opens them); when the optional ``rerun`` SDK is installed,
``--stream`` streams the sequence to the Rerun viewer instead.

Usage:
  # one frame -> PLY
  python tools/visualize_semantic_labels.py \
      --bin-dir <.../sequences/05/velodyne> --label-dir <.../05/labels> \
      --frame 0 --out /tmp/frame0.ply
  # whole sequence -> PLY directory (or --stream with rerun installed)
  python tools/visualize_semantic_labels.py --bin-dir ... --label-dir ... \
      --out-dir /tmp/seq05
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pointcept_keypointdetection_tpu.utils.visualization import save_point_cloud

# SemanticKITTI official color map (BGR in the devkit; stored here as RGB),
# keyed by RAW label id (`semantic-kitti.yaml` color_map).
COLOR_MAP = {
    0: (0, 0, 0), 1: (255, 0, 0), 10: (100, 150, 245), 11: (100, 230, 245),
    13: (60, 30, 100), 15: (30, 60, 150), 16: (0, 0, 255), 18: (80, 30, 180),
    20: (0, 0, 255), 30: (255, 30, 30), 31: (255, 40, 200), 32: (150, 30, 90),
    40: (255, 0, 255), 44: (255, 150, 255), 48: (75, 0, 75), 49: (175, 0, 75),
    50: (255, 200, 0), 51: (255, 120, 50), 52: (255, 150, 0), 60: (150, 255, 170),
    70: (0, 175, 0), 71: (135, 60, 0), 72: (150, 240, 80), 80: (255, 240, 150),
    81: (255, 0, 0), 99: (50, 255, 255), 252: (100, 150, 245), 253: (255, 40, 200),
    254: (255, 30, 30), 255: (150, 30, 90), 256: (0, 0, 255), 257: (60, 30, 100),
    258: (80, 30, 180), 259: (0, 0, 255),
}


def label_colors(labels: np.ndarray) -> np.ndarray:
    lut = np.zeros((max(COLOR_MAP) + 1, 3), np.uint8)
    for k, v in COLOR_MAP.items():
        lut[k] = v
    # semantic label lives in the low 16 bits (instance id in the high 16)
    sem = labels.astype(np.uint32) & 0xFFFF
    return lut[np.clip(sem, 0, lut.shape[0] - 1)]


def load_frame(bin_path: str, label_dir: str):
    scan = np.fromfile(bin_path, np.float32).reshape(-1, 4)
    fid = os.path.splitext(os.path.basename(bin_path))[0]
    lab_file = os.path.join(label_dir, f"{fid}.label")
    npy_file = os.path.join(label_dir, f"{fid}.npy")
    if os.path.exists(lab_file):
        labels = np.fromfile(lab_file, np.uint32)
    elif os.path.exists(npy_file):
        labels = np.load(npy_file).astype(np.uint32)
    else:
        labels = np.zeros(scan.shape[0], np.uint32)
    return scan[:, :3], labels


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bin-dir", required=True)
    ap.add_argument("--label-dir", required=True, help=".label or predicted .npy dir")
    ap.add_argument("--frame", type=int, default=None, help="single frame index")
    ap.add_argument("--out", default=None, help="single-frame PLY output")
    ap.add_argument("--out-dir", default=None, help="whole-sequence PLY output dir")
    ap.add_argument("--stream", action="store_true", help="stream via rerun if installed")
    args = ap.parse_args()

    bins = sorted(glob.glob(os.path.join(args.bin_dir, "*.bin")))
    if args.frame is not None:
        bins = bins[args.frame : args.frame + 1]

    rr = None
    if args.stream:
        try:
            import rerun as rr  # optional; absent from this image

            rr.init("semantic_kitti", spawn=True)
        except ImportError:
            print("rerun not installed; falling back to PLY output")
            rr = None

    for i, bin_path in enumerate(bins):
        coord, labels = load_frame(bin_path, args.label_dir)
        colors = label_colors(labels)
        if rr is not None:
            rr.set_time_sequence("frame", i)
            rr.log("scan", rr.Points3D(coord, colors=colors))
        elif args.out and args.frame is not None:
            save_point_cloud(args.out, coord, colors)
            print(f"wrote {args.out} ({coord.shape[0]} pts)")
        else:
            out_dir = args.out_dir or "/tmp/semantic_viz"
            os.makedirs(out_dir, exist_ok=True)
            name = os.path.splitext(os.path.basename(bin_path))[0] + ".ply"
            save_point_cloud(os.path.join(out_dir, name), coord, colors)
    if rr is None and args.frame is None:
        print(f"wrote {len(bins)} frames -> {args.out_dir or '/tmp/semantic_viz'}")


if __name__ == "__main__":
    main()
