"""Generate dense offset+mask keypoint labels offline.

Parity surface: reference `tools/generate_keypoint_offsets.py` — for each
cloud/keypoint pair under <root>/<split>/, write
``keypoints/<name>_keypoint_offset.npy`` of shape (N, K, 4) with
``offset = keypoint - point`` masked by ``|offset| <= radius``.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from pointcept_keypointdetection_tpu.datasets.keypoint_dataset import _find_keypoint_path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-root", required=True)
    parser.add_argument("--splits", nargs="+", default=["train", "val"])
    parser.add_argument("--radius", type=float, default=300.0)
    parser.add_argument("--num-keypoints", type=int, default=6)
    args = parser.parse_args()

    for split in args.splits:
        split_path = os.path.join(args.data_root, split)
        kp_dir = os.path.join(split_path, "keypoints")
        count = 0
        for cloud in sorted(glob.glob(os.path.join(split_path, "pointclouds", "*.npy"))):
            name = os.path.splitext(os.path.basename(cloud))[0]
            kp_path = _find_keypoint_path(kp_dir, name)
            if kp_path is None:
                print(f"skip {name}: no keypoint file")
                continue
            raw = np.nan_to_num(np.load(cloud).astype(np.float32))
            kp = np.nan_to_num(np.load(kp_path).astype(np.float32)).reshape(-1, 3)
            if kp.shape[0] != args.num_keypoints:
                print(f"skip {name}: {kp.shape[0]} keypoints")
                continue
            coord = raw[:, :3]
            offsets = kp[None, :, :] - coord[:, None, :]
            mask = (np.linalg.norm(offsets, axis=-1) <= args.radius).astype(np.float32)
            target = np.concatenate([offsets * mask[..., None], mask[..., None]], axis=-1)
            np.save(os.path.join(kp_dir, f"{name}_keypoint_offset.npy"), target.astype(np.float32))
            count += 1
        print(f"[{split}] wrote {count} label files")


if __name__ == "__main__":
    main()
