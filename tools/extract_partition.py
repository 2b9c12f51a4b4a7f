"""Add Felzenszwalb oversegmentation partitions to processed ScanNet scenes.

Parity surface: `pointcept/datasets/preprocessing/scannet/extract_partition.py`
— the reference shells out to the ScanNet Segmentator binary on each raw
``_vh_clean_2.ply`` mesh and stores the per-vertex segment id as an extra
key of the processed scene.  Here the graph segmentation is the in-repo C++
union-find (``csrc/pointseg.cpp``, the `libs/pointseg` replacement), and the
result is written as ``partition.npy`` next to the scene's other assets.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pointcept_keypointdetection_tpu.datasets.preprocessing.ply import read_ply, vertex_arrays  # noqa: E402
from pointcept_keypointdetection_tpu.ops.native import segment_mesh  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset_root", required=True, help="raw ScanNet root")
    parser.add_argument("--processed_root", required=True, help="processed scene dirs")
    parser.add_argument("--split", default="test", choices=["test", "val", "train"])
    parser.add_argument("--k", type=float, default=0.01, help="segmentation threshold kThresh")
    parser.add_argument("--min_size", type=int, default=20, help="min vertices per segment")
    args = parser.parse_args()

    raw_split = "scans_test" if args.split == "test" else "scans"
    scene_list = sorted(glob.glob(os.path.join(args.processed_root, args.split, "scene*")))
    for scene_dir in scene_list:
        name = os.path.basename(scene_dir)
        ply_path = os.path.join(args.dataset_root, raw_split, name, f"{name}_vh_clean_2.ply")
        if not os.path.isfile(ply_path):
            print(f"skip {name}: missing {ply_path}")
            continue
        ply = read_ply(ply_path)
        coord, _, _ = vertex_arrays(ply)
        faces = np.asarray(ply["face"])
        partition = segment_mesh(
            coord.astype(np.float32), faces.astype(np.int32), k=args.k, min_size=args.min_size
        )
        np.save(os.path.join(scene_dir, "partition.npy"), partition.astype(np.int32))
        print(f"{name}: {partition.max() + 1} segments over {len(partition)} vertices")


if __name__ == "__main__":
    main()
