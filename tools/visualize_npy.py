"""Visualize .npy point clouds / predictions as PLY files.

Parity surface: reference `tools/visualize_npy.py`,
`visualize_keypoint_offset_npy.py`, `inspect_npy.py` — headless PLY export
(labels colored by palette, keypoints as marker clusters) plus array
inspection.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from pointcept_keypointdetection_tpu.utils.visualization import (
    save_keypoints,
    save_labeled_cloud,
    save_point_cloud,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("cloud", help=".npy cloud (N, >=3)")
    parser.add_argument("--labels", default=None, help=".npy per-point labels")
    parser.add_argument("--keypoints", default=None, help=".npy (K, 3) keypoints")
    parser.add_argument("--out", default=None)
    parser.add_argument("--inspect", action="store_true")
    args = parser.parse_args()

    raw = np.load(args.cloud)
    if args.inspect:
        print(f"shape={raw.shape} dtype={raw.dtype}")
        print(f"min={np.nanmin(raw, 0)}\nmax={np.nanmax(raw, 0)}\nmean={np.nanmean(raw, 0)}")
        print(f"NaN rows: {np.isnan(raw).any(1).sum()}")
        return

    coord = raw[:, :3]
    out = args.out or os.path.splitext(args.cloud)[0] + ".ply"
    if args.labels:
        save_labeled_cloud(out, coord, np.load(args.labels))
    elif raw.shape[1] >= 6:
        save_point_cloud(out, coord, np.clip((raw[:, 3:6] + 1) * 127.5, 0, 255))
    else:
        save_point_cloud(out, coord)
    print(f"wrote {out}")
    if args.keypoints:
        kp_out = os.path.splitext(out)[0] + "_keypoints.ply"
        save_keypoints(kp_out, np.load(args.keypoints))
        print(f"wrote {kp_out}")


if __name__ == "__main__":
    main()
