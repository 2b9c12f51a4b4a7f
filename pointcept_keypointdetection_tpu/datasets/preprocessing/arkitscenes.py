"""ArkitScenes preprocessing: 3dod meshes -> npy dirs (coord/color/normal).

Parity surface: `pointcept/datasets/preprocessing/arkitscenes/
preprocess_arkitscenes_mesh.py` — read each ``*_mesh.ply``, compute
area-weighted vertex normals, save per-scene npy dirs under the original
Training/Validation split folders.  Self-contained (our PLY reader, no
plyfile/pandas).
"""

from __future__ import annotations

import argparse
import glob
import os
from concurrent.futures import ProcessPoolExecutor
from itertools import repeat
from pathlib import Path

import numpy as np

from .ply import read_ply, vertex_arrays
from .scannetpp import vertex_normals


def parse_scene(scene_path, output_root):
    print(f"parsing {scene_path}")
    split = os.path.basename(os.path.dirname(os.path.dirname(scene_path)))
    scene_id = os.path.basename(os.path.dirname(scene_path))
    ply = read_ply(scene_path)
    coord, color, _ = vertex_arrays(ply)
    faces = np.asarray(ply["face"], np.int64)
    normal = vertex_normals(coord, faces)
    out = Path(output_root) / split / scene_id
    out.mkdir(parents=True, exist_ok=True)
    np.save(out / "coord.npy", coord.astype(np.float32))
    np.save(out / "color.npy", (color if color is not None else np.zeros_like(coord)).astype(np.uint8))
    np.save(out / "normal.npy", normal)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", required=True, help="dir containing the 3dod folder")
    ap.add_argument("--output_root", required=True)
    ap.add_argument("--num_workers", type=int, default=os.cpu_count())
    opt = ap.parse_args()
    scene_paths = sorted(glob.glob(os.path.join(opt.dataset_root, "3dod", "*", "*", "*_mesh.ply")))
    print(f"{len(scene_paths)} scenes")
    with ProcessPoolExecutor(max_workers=opt.num_workers) as pool:
        list(pool.map(parse_scene, scene_paths, repeat(opt.output_root)))


if __name__ == "__main__":
    main()
