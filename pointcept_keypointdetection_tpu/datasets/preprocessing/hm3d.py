"""HM3D preprocessing: textured GLB meshes -> sampled npy room clouds.

Parity surface: `pointcept/datasets/preprocessing/hm3d/preprocess_hm3d.py` —
per scene: surface-sample each room's meshes at the given density, fetch
colors from the PBR base-color texture via barycentric UVs, read semantic
labels from the paired ``*.semantic.glb`` texture colors through the
``*.semantic.txt`` hex->category mapping (40-class benchmark), split scenes
by official id (<800 train, else val; 900+ reserved test).

Requires ``pip install trimesh`` (absent from this image; like the other
heavy preprocessing toolkits this runs in its own venv).
"""

from __future__ import annotations

import argparse
import glob
import os
from concurrent.futures import ProcessPoolExecutor
from itertools import repeat
from pathlib import Path

import numpy as np

try:  # pragma: no cover - optional heavy dependency
    import trimesh
except ImportError:
    trimesh = None

CLASS_LABELS_40 = (
    "wall", "floor", "chair", "door", "table", "picture", "cabinet", "cushion",
    "window", "sofa", "bed", "curtain", "chest of drawers", "plant", "sink",
    "stairs", "ceiling", "toilet", "stool", "towel", "mirror", "tv monitor",
    "shower", "column", "bathtub", "counter", "fireplace", "lighting", "beam",
    "railing", "shelving", "blinds", "gym equipment", "seating", "board panel",
    "furniture", "appliances", "clothes", "objects", "misc",
)
CAT2INDEX = {name: i for i, name in enumerate(CLASS_LABELS_40)}


def uv_to_texture_colors(uvs, texture):
    """Vectorized texel fetch (reference does per-point getpixel)."""
    tex = np.asarray(texture)
    h, w = tex.shape[:2]
    u = (uvs[:, 0] * w).astype(int)
    v = ((1 - uvs[:, 1]) * h).astype(int)
    ok = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    out = np.zeros((len(uvs), 3), np.int32)
    out[ok] = tex[v[ok], u[ok], :3]
    return out


def load_hex_mapping(mapping_path):
    hex2label = {}
    with open(mapping_path) as f:
        f.readline()  # 'HM3D Semantic Annotations'
        for line in f:
            parts = line.strip().split(",")
            if len(parts) < 3:
                continue
            cat = parts[2].strip('"')
            cat = {"trashcan": "trash can", "fridge": "refrigerator"}.get(cat, cat)
            hex2label[parts[1].upper()] = dict(
                instance=parts[0], segment=CAT2INDEX.get(cat, -1)
            )
    return hex2label


def handle_process(scene_path, output_root, density=0.02):
    scene_path = Path(scene_path)
    label_path = scene_path.with_suffix(".semantic.glb")
    mapping_path = scene_path.with_suffix(".semantic.txt")
    scene_name = scene_path.parent.name.replace("-", "_")
    scene_id = scene_name.split("_")[0]
    labeled = label_path.is_file()
    split = "train" if 0 <= int(scene_id) < 800 else "val"
    print(f"parsing {scene_name} -> {split}")

    scene = trimesh.load(scene_path)
    labeled_geo = {}
    hex2label = {}
    if labeled:
        for name, mesh in trimesh.load(label_path).geometry.items():
            labeled_geo[name.split("_")[0]] = mesh
        hex2label = load_hex_mapping(mapping_path)

    rooms = {}
    for name, mesh in scene.geometry.items():
        room_id = "_".join(name.split("_")[1:3]).replace("group", "").replace("sub", "")
        rooms.setdefault(room_id, []).append((name.split("_")[0], mesh))

    for room_id, meshes in rooms.items():
        np.random.seed(int(scene_id + room_id.replace("_", "")))
        coord_l, color_l, normal_l, label_color_l = [], [], [], []
        for chunk, mesh in meshes:
            num_points = int(np.sum(mesh.area_faces) / density**2)
            if num_points == 0 or mesh.visual.material.baseColorTexture is None:
                continue
            coords, face_idx = mesh.sample(num_points, return_index=True)
            faces = mesh.faces[face_idx]
            tri = mesh.vertices[faces]
            bary = trimesh.triangles.points_to_barycentric(tri, coords)
            uvs = np.einsum("ijk,ij->ik", mesh.visual.uv[faces], bary)
            coord_l.append(coords)
            color_l.append(uv_to_texture_colors(uvs, mesh.visual.material.baseColorTexture))
            normal_l.append(np.einsum("ijk,ij->ik", mesh.vertex_normals[faces], bary))
            if labeled and chunk in labeled_geo:
                ltex = labeled_geo[chunk].visual.material.baseColorTexture
                label_color_l.append(uv_to_texture_colors(uvs, ltex))
            elif labeled:
                label_color_l.append(np.zeros((len(coords), 3), np.int32))
        if not coord_l:
            continue
        data = dict(
            coord=np.concatenate(coord_l).astype(np.float32),
            color=np.concatenate(color_l).astype(np.uint8),
            normal=np.concatenate(normal_l).astype(np.float32),
        )
        if labeled:
            lc = np.concatenate(label_color_l)
            uniq = np.unique(lc, axis=0)
            instance = -np.ones(len(lc), np.int16)
            segment = -np.ones(len(lc), np.int16)
            for i, c in enumerate(uniq):
                mask = np.all(lc == c, axis=-1)
                instance[mask] = i
                key = "{:02X}{:02X}{:02X}".format(*c)
                if key in hex2label:
                    segment[mask] = hex2label[key]["segment"]
            data["instance"] = instance
            data["segment"] = segment
        out = Path(output_root) / split / f"{scene_name}_{room_id}"
        out.mkdir(parents=True, exist_ok=True)
        for key, val in data.items():
            np.save(out / f"{key}.npy", val)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", required=True)
    ap.add_argument("--output_root", required=True)
    ap.add_argument("--density", type=float, default=0.02)
    ap.add_argument("--num_workers", type=int, default=os.cpu_count())
    args = ap.parse_args()
    if trimesh is None:
        raise SystemExit("trimesh is not installed; `pip install trimesh` in a preprocessing venv.")
    scenes = [s for s in glob.glob(os.path.join(args.dataset_root, "*", "*.glb")) if not s.endswith("semantic.glb")]
    print(f"{len(scenes)} scenes")
    with ProcessPoolExecutor(max_workers=args.num_workers) as pool:
        list(pool.map(handle_process, scenes, repeat(args.output_root), repeat(args.density)))


if __name__ == "__main__":
    main()


def filter_top_scenes(dataset_root: str, num_keep: int = 10000) -> int:
    """Keep only the ``num_keep`` largest processed scenes (by point count),
    moving the rest into sibling ``<split>_rm`` directories — the HM3D
    curation step (reference `preprocessing/hm3d/filter_hm3d.py`: the raw
    release has ~2x more tiny/low-value scenes than the pretraining recipe
    wants).  Returns the number of scenes moved."""
    import shutil

    scene_list = sorted(glob.glob(os.path.join(dataset_root, "*", "*")))
    scene_list = [s for s in scene_list if os.path.isdir(s) and not s.endswith("_rm")]
    scene_list = [s for s in scene_list if not Path(s).parent.name.endswith("_rm")]
    if len(scene_list) <= num_keep:
        return 0
    sizes = []
    for s in scene_list:
        arr = np.load(os.path.join(s, "coord.npy"), mmap_mode="r")
        sizes.append(arr.shape[0])
    order = np.argsort(sizes)
    moved = 0
    for i in order[: len(scene_list) - num_keep]:
        src = Path(scene_list[i])
        dst_dir = src.parent.parent / f"{src.parent.name}_rm"
        dst_dir.mkdir(exist_ok=True)
        shutil.move(str(src), str(dst_dir / src.name))
        moved += 1
    return moved
