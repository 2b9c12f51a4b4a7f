"""ScanNet++ preprocessing: mesh PLY + segment annotations -> npy-dir samples.

Parity surface: `pointcept/datasets/preprocessing/scannetpp/
preprocess_scannetpp.py` — per scene: read ``mesh_aligned_0.05.ply`` (coord /
color / face-computed normals), run graph-based superpoint segmentation (our
C++ ``pointseg`` replacement), and build TOP-3 semantic/instance labels per
vertex from ``segments.json`` + ``segments_anno.json`` with the
smallest-instance-major reordering the benchmark expects.

Self-contained: PLY via our reader, normals via numpy face accumulation,
label mapping via csv (no pandas/o3d required, though pandas is used when
available for exact csv semantics).
"""

from __future__ import annotations

import argparse
import csv
import json
import os
from collections import OrderedDict
from concurrent.futures import ProcessPoolExecutor
from itertools import repeat
from pathlib import Path

import numpy as np

from .ply import read_ply, vertex_arrays


def vertex_normals(coord: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals from triangle faces (replaces
    o3d.compute_vertex_normals)."""
    v0, v1, v2 = coord[faces[:, 0]], coord[faces[:, 1]], coord[faces[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)  # area-weighted
    normal = np.zeros_like(coord)
    for k in range(3):
        np.add.at(normal, faces[:, k], fn)
    norm = np.linalg.norm(normal, axis=1, keepdims=True)
    return (normal / np.maximum(norm, 1e-12)).astype(np.float32)


def filter_map_classes(rows, map_key="semantic_map_to"):
    """csv rows -> {class: mapped_class}; 'None' targets drop the class
    (parity: preprocess_scannetpp.py:filter_map_classes)."""
    map_dict = OrderedDict()
    for row in rows:
        class_name = row["class"]
        target = row.get(map_key) or ""
        if target:
            if target != "None":
                map_dict[class_name] = target
        elif class_name not in map_dict:
            map_dict[class_name] = class_name
    return map_dict


def parse_scene(name, split, dataset_root, output_root, label_mapping, class2idx, ignore_index=-1):
    print(f"parsing {split}/{name}")
    dataset_root, output_root = Path(dataset_root), Path(output_root)
    scene = dataset_root / "data" / name / "scans"
    ply = read_ply(str(scene / "mesh_aligned_0.05.ply"))
    coord, color, _ = vertex_arrays(ply)
    faces = np.asarray(ply.get("face"))
    normal = vertex_normals(coord, faces) if faces is not None else np.zeros_like(coord)
    color = (color if color is not None else np.zeros_like(coord)).astype(np.uint8)

    save = output_root / split / name
    save.mkdir(parents=True, exist_ok=True)
    np.save(save / "coord.npy", coord.astype(np.float32))
    np.save(save / "color.npy", color)
    np.save(save / "normal.npy", normal)

    try:
        from ...ops.native import segment_mesh

        superpoint = segment_mesh(coord, faces.astype(np.int64))
        np.save(save / "superpoint.npy", np.asarray(superpoint))
    except Exception as e:  # native lib unavailable — superpoints optional
        print(f"  superpoint skipped ({e})")

    if split == "test":
        return

    segments = json.load(open(scene / "segments.json"))
    anno = json.load(open(scene / "segments_anno.json"))
    seg_indices = np.asarray(segments["segIndices"], np.uint32)
    n = len(seg_indices)
    assert n == len(coord), (n, len(coord))

    # top-3 label slots per vertex, smallest instance becomes the major label
    semantic_gt = np.full((n, 3), ignore_index, np.int16)
    instance_gt = np.full((n, 3), ignore_index, np.int16)
    instance_size = np.full((n, 3), np.inf)
    labels_used = np.zeros(n, np.int16)

    for instance in anno["segGroups"]:
        mapped = label_mapping.get(instance["label"])
        label_index = class2idx.get(mapped, ignore_index)
        if label_index == ignore_index:
            continue
        mask = np.isin(seg_indices, instance["segments"]) & (labels_used < 3)
        size = mask.sum()
        if size == 0:
            continue
        pos = labels_used[mask]
        rows = np.where(mask)[0]
        semantic_gt[rows, pos] = label_index
        instance_gt[rows, pos] = instance["objectId"]
        instance_size[rows, pos] = size
        labels_used[mask] += 1

    multi = labels_used > 1
    if multi.sum() > 0:
        rows = np.where(multi)[0]
        major = np.argmin(instance_size[rows], axis=1)
        for arr in (semantic_gt, instance_gt):
            maj = arr[rows, major]
            arr[rows, major] = arr[rows, 0]
            arr[rows, 0] = maj

    np.save(save / "segment.npy", semantic_gt)
    np.save(save / "instance.npy", instance_gt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", required=True)
    ap.add_argument("--output_root", required=True)
    ap.add_argument("--ignore_index", type=int, default=-1)
    ap.add_argument("--num_workers", type=int, default=os.cpu_count())
    cfg = ap.parse_args()
    root = Path(cfg.dataset_root)

    train_list = np.loadtxt(root / "splits" / "nvs_sem_train.txt", dtype=str, ndmin=1)
    val_list = np.loadtxt(root / "splits" / "nvs_sem_val.txt", dtype=str, ndmin=1)
    test_list = np.loadtxt(root / "splits" / "sem_test.txt", dtype=str, ndmin=1)
    data_list = np.concatenate([train_list, val_list, test_list])
    # NOT full_like: that would truncate "train" to the scene-id dtype width
    split_list = np.concatenate(
        [
            np.full(len(train_list), "train"),
            np.full(len(val_list), "val"),
            np.full(len(test_list), "test"),
        ]
    )

    class_names = np.loadtxt(
        root / "metadata" / "semantic_benchmark" / "top100.txt", dtype=str, delimiter="."
    )
    with open(root / "metadata" / "semantic_benchmark" / "map_benchmark.csv") as f:
        rows = list(csv.DictReader(f))
    label_mapping = filter_map_classes(rows)
    class2idx = {name: i for i, name in enumerate(class_names)}

    with ProcessPoolExecutor(max_workers=cfg.num_workers) as pool:
        list(
            pool.map(
                parse_scene,
                data_list,
                split_list,
                repeat(cfg.dataset_root),
                repeat(cfg.output_root),
                repeat(label_mapping),
                repeat(class2idx),
                repeat(cfg.ignore_index),
            )
        )


if __name__ == "__main__":
    main()
