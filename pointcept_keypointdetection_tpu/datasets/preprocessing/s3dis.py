"""S3DIS preprocessing: Stanford room annotations -> per-room .npy dirs.

Parity surface: `pointcept/datasets/preprocessing/s3dis/preprocess_s3dis.py`
— reads ``Area_*/room/Annotations/<class>_*.txt`` (x y z r g b per line),
writes coord/color/segment/instance npy under ``<output>/Area_X/room/``.

Usage:
  python -m pointcept_keypointdetection_tpu.datasets.preprocessing.s3dis \
      --dataset_root /data/Stanford3dDataset_v1.2 --output_root data/s3dis
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

CLASS_NAMES = (
    "ceiling", "floor", "wall", "beam", "column", "window", "door", "table",
    "chair", "sofa", "bookcase", "board", "clutter",
)
CLASS_TO_ID = {name: i for i, name in enumerate(CLASS_NAMES)}


def process_room(room_dir: str, output_dir: str):
    coords, colors, segments, instances = [], [], [], []
    ann_files = sorted(glob.glob(os.path.join(room_dir, "Annotations", "*.txt")))
    for inst_id, path in enumerate(ann_files):
        cls = os.path.basename(path).split("_")[0]
        seg_id = CLASS_TO_ID.get(cls, CLASS_TO_ID["clutter"])
        data = np.loadtxt(path)
        if data.ndim == 1:
            data = data[None]
        coords.append(data[:, :3].astype(np.float32))
        colors.append(data[:, 3:6].astype(np.uint8))
        segments.append(np.full(len(data), seg_id, np.int32))
        instances.append(np.full(len(data), inst_id, np.int32))
    if not coords:
        return False
    os.makedirs(output_dir, exist_ok=True)
    np.save(os.path.join(output_dir, "coord.npy"), np.concatenate(coords))
    np.save(os.path.join(output_dir, "color.npy"), np.concatenate(colors))
    np.save(os.path.join(output_dir, "segment.npy"), np.concatenate(segments))
    np.save(os.path.join(output_dir, "instance.npy"), np.concatenate(instances))
    return True


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--output_root", required=True)
    args = parser.parse_args()
    for area_dir in sorted(glob.glob(os.path.join(args.dataset_root, "Area_*"))):
        area = os.path.basename(area_dir)
        for room_dir in sorted(glob.glob(os.path.join(area_dir, "*"))):
            if not os.path.isdir(room_dir):
                continue
            room = os.path.basename(room_dir)
            out = os.path.join(args.output_root, area, room)
            if os.path.exists(os.path.join(out, "coord.npy")):
                continue
            if process_room(room_dir, out):
                print(f"{area}/{room}")


if __name__ == "__main__":
    main()
