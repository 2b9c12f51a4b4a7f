"""Visualize dense offset-keypoint labels as colored PLY dumps.

Parity surface: reference `tools/visualize_keypoint_offset_npy.py` — for a
cloud + its (N, K, 4) offset/mask labels, paint in-radius points per keypoint
and draw the reconstructed keypoint positions."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pointcept_keypointdetection_tpu.utils.visualization import save_point_cloud

PALETTE = np.array(
    [
        (255, 50, 50), (50, 255, 50), (50, 100, 255),
        (255, 255, 50), (255, 50, 255), (50, 255, 255),
        (255, 150, 50), (150, 50, 255),
    ],
    np.uint8,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cloud_npy", help="(N, >=3) cloud: xyz + features")
    ap.add_argument("offset_npy", help="(N, K, 4) offset+mask labels")
    ap.add_argument("--out", default=None, help="output .ply (default: alongside input)")
    args = ap.parse_args()

    raw = np.load(args.cloud_npy).astype(np.float32)
    coord = raw[:, :3]
    labels = np.load(args.offset_npy).astype(np.float32)
    n, k = labels.shape[0], labels.shape[1]
    assert n == len(coord), (labels.shape, coord.shape)

    color = np.full((n, 3), 140, np.uint8)
    for i in range(k):
        mask = labels[:, i, 3] > 0.5
        color[mask] = PALETTE[i % len(PALETTE)]

    # reconstructed keypoints: mean of (point + offset) over masked points
    kp_pts, kp_col = [], []
    for i in range(k):
        mask = labels[:, i, 3] > 0.5
        if mask.any():
            kp = (coord[mask] + labels[mask, i, :3]).mean(axis=0)
            kp_pts.append(kp)
            kp_col.append((PALETTE[i % len(PALETTE)] // 2).astype(np.uint8))
            print(f"keypoint {i}: {int(mask.sum())} in-radius points, reconstructed at {np.round(kp, 2)}")
        else:
            print(f"keypoint {i}: no in-radius points")

    pts = np.concatenate([coord] + ([np.stack(kp_pts)] if kp_pts else []), axis=0)
    cols = np.concatenate([color] + ([np.stack(kp_col)] if kp_col else []), axis=0)
    out = args.out or os.path.splitext(args.cloud_npy)[0] + "_offset_viz.ply"
    save_point_cloud(out, pts, cols)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
