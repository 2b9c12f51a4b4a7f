"""Matterport3D preprocessing: region meshes -> npy-dir samples.

Parity surface: `pointcept/datasets/preprocessing/matterport3d/
preprocess_matterport3d_mesh.py` — per region PLY (which carries per-face
``category_id``): map raw categories -> NYU40 via the dataset's
``category_mapping.tsv``, keep the ScanNet-20+ceiling subset, vote per-vertex
labels from face labels, save coord/color/normal/segment.

Inputs (all ship with the Matterport3D release):
  * ``<dataset_root>/v1/scans/<scene>/region_segmentations/*.ply``
  * ``--category_mapping``: metadata/category_mapping.tsv (raw -> nyu40id)
  * ``--splits_dir``: scenes_train.txt / scenes_val.txt / scenes_test.txt
    (the official benchmark split lists)
"""

from __future__ import annotations

import argparse
import glob
import os
from concurrent.futures import ProcessPoolExecutor
from itertools import repeat
from pathlib import Path

import numpy as np

from .ply import read_ply

# NYU40 ids kept by the benchmark (ScanNet 20 + ceiling), and their remap to
# 0..21 (`preprocess_matterport3d_mesh.py:23-47`)
MATTERPORT_ALLOWED_NYU_CLASSES = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 22, 24, 28, 33, 34, 36, 39]
MATTERPORT_CLASS_REMAP = np.zeros(41, dtype=np.int64)
for new, old in enumerate(
    [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39], start=1
):
    MATTERPORT_CLASS_REMAP[old] = new
MATTERPORT_CLASS_REMAP[22] = 21  # ceiling — difference to ScanNet

MATTERPORT_LABELS_21 = (
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refrigerator", "shower curtain", "toilet", "sink", "bathtub",
    "other furniture", "ceiling",
)


def load_category_mapping(path: str) -> np.ndarray:
    """category_mapping.tsv -> raw category index -> nyu40id lookup (index 0
    reserved for 'unlabeled')."""
    import csv

    nyu40 = []
    with open(path) as f:
        for row in csv.DictReader(f, delimiter="\t"):
            val = row.get("nyu40id") or "0"
            try:
                nyu40.append(int(float(val)))
            except ValueError:
                nyu40.append(0)
    return np.insert(np.asarray(nyu40, np.int64), 0, 0)


def handle_region(ply_path, output_root, mapping, train_scenes, val_scenes):
    ply_path = Path(ply_path)
    scene_id = ply_path.parent.parent.name
    data_name = f"{scene_id}_{ply_path.stem}"
    split = "train" if scene_id in train_scenes else "val" if scene_id in val_scenes else "test"
    out = Path(output_root) / split / data_name
    out.mkdir(parents=True, exist_ok=True)
    print(f"processing {split}/{data_name}")

    ply = read_ply(str(ply_path))
    v = ply["vertex"]
    coord = np.stack([v["x"], v["y"], v["z"]], 1).astype(np.float32)
    color = np.stack([v["red"], v["green"], v["blue"]], 1).astype(np.uint8)
    names = v.dtype.names
    normal = (
        np.stack([v["nx"], v["ny"], v["nz"]], 1).astype(np.float32)
        if "nx" in names
        else np.zeros_like(coord)
    )

    face = ply["face"]
    if isinstance(face, dict):
        triangles = np.asarray(face["vertex_indices"], np.int64)
        category_id = np.asarray(face["category_id"], np.int64)
    else:  # no category property: unlabeled mesh
        triangles = np.asarray(face, np.int64)
        category_id = np.zeros(len(triangles), np.int64)

    category_id = np.where(category_id < 0, 0, category_id)
    category_id = np.minimum(category_id, len(mapping) - 1)
    nyu = mapping[category_id]
    nyu[~np.isin(nyu, MATTERPORT_ALLOWED_NYU_CLASSES)] = 0
    face_label = MATTERPORT_CLASS_REMAP[nyu]  # 0 = unlabeled, 1..21 classes

    # per-vertex majority vote over incident faces (vectorized bincount)
    n = len(coord)
    votes = np.zeros((n, 22), np.int32)
    for k in range(3):
        np.add.at(votes, (triangles[:, k], face_label), 1)
    segment = votes.argmax(axis=1).astype(np.int16) - 1  # -1 = unlabeled

    np.save(out / "coord.npy", coord)
    np.save(out / "color.npy", color)
    np.save(out / "normal.npy", normal)
    np.save(out / "segment.npy", segment)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", required=True)
    ap.add_argument("--output_root", required=True)
    ap.add_argument("--category_mapping", required=True, help="metadata/category_mapping.tsv")
    ap.add_argument("--splits_dir", required=True, help="dir of scenes_{train,val,test}.txt")
    ap.add_argument("--num_workers", type=int, default=os.cpu_count())
    opt = ap.parse_args()

    mapping = load_category_mapping(opt.category_mapping)
    train_scenes = set(open(os.path.join(opt.splits_dir, "scenes_train.txt")).read().split())
    val_scenes = set(open(os.path.join(opt.splits_dir, "scenes_val.txt")).read().split())

    plys = sorted(
        glob.glob(os.path.join(opt.dataset_root, "v1", "scans", "*", "region_segmentations", "*.ply"))
    )
    print(f"{len(plys)} regions")
    with ProcessPoolExecutor(max_workers=opt.num_workers) as pool:
        list(pool.map(handle_region, plys, repeat(opt.output_root), repeat(mapping),
                      repeat(train_scenes), repeat(val_scenes)))


if __name__ == "__main__":
    main()
