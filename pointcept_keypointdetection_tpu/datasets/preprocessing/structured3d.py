"""Structured3D preprocessing: zipped pano/perspective renders -> npy scenes.

Parity surface: `pointcept/datasets/preprocessing/structured3d/
preprocess_structured3d.py` — read the release zips directly, unproject
perspective frames (pinhole from camera_pose.txt) and panoramas
(equirectangular), estimate normals from image-grid differences, filter
grazing/invalid pixels (|cos| > 0.15, valid depth, labeled), fuse per room,
map NYU ids to the 25-class benchmark, optional grid sampling, and save
coord/color/normal/segment npy dirs split by scene id (<3000 train,
3000-3249 val, rest test).  The zip layout, camera-file format, axis
conventions and filter thresholds are dataset-release facts; the code
structure here is this repo's (flat helpers over a zip index + one fuse
buffer, like preprocessing/scannetpp.py).
"""

from __future__ import annotations

import argparse
import io
import os
import zipfile
from concurrent.futures import ProcessPoolExecutor
from itertools import repeat

import numpy as np

VALID_CLASS_IDS_25 = (
    1, 2, 3, 4, 5, 6, 7, 8, 9, 11, 14, 15, 16, 17, 18, 19, 22, 24, 25, 32, 34, 35, 38, 39, 40,
)
CLASS_LABELS_25 = (
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "picture", "desk", "shelves", "curtain", "dresser", "pillow",
    "mirror", "ceiling", "refrigerator", "television", "nightstand", "sink",
    "lamp", "otherstructure", "otherfurniture", "otherprop",
)

# release axis conventions: camera text files are z-up mm; fused scenes are
# saved y/z-swapped (both are permutation facts of the dataset, not choices)
_ZUP_TO_YUP = (1, 2, 0)  # v_yup = v[perm]
_SAVE_SWAP = np.array([[1, 0, 0], [0, 0, 1], [0, 1, 0]], np.float32)


class ZipTree:
    """Flat random-access index over a set of release zips."""

    def __init__(self, paths):
        self._zips = [zipfile.ZipFile(p, "r") for p in paths]
        self._where = {n: z for z in self._zips for n in z.namelist()}

    def child_dirs(self, prefix):
        prefix = prefix.strip("/") + "/"
        kids = {n[len(prefix):].split("/", 1)[0] for n in self._where if n.startswith(prefix)}
        kids.discard("")
        return sorted(kids)

    def bytes(self, name):
        return self._where[name].read(name)


def _unit(v):
    n = np.linalg.norm(v, axis=-1, keepdims=True)
    return np.divide(v, n, out=np.zeros_like(v), where=n != 0)


def grid_normals(pts):
    """Normals of an [H, W, 3] point grid from forward differences (zero at
    the far edges, matching the release renders' border handling)."""
    d_row = np.zeros_like(pts)
    d_row[:-1] = pts[:-1] - pts[1:]
    d_col = np.zeros_like(pts)
    d_col[:, :-1] = pts[:, :-1] - pts[:, 1:]
    return _unit(np.cross(d_row, d_col))


def load_camera(tree, name):
    """camera_pose.txt / camera_xyz.txt -> (R, t_m, (fx, fy) | None), y-up."""
    vals = np.fromstring(tree.bytes(name), dtype=np.float32, sep=" ")
    t = (vals[:3] / 1000.0)[list(_ZUP_TO_YUP)]
    if vals.shape[0] <= 3:  # panorama: position only
        return np.eye(3, dtype=np.float32), t, None
    front, up = vals[3:6], vals[6:9]
    frame = np.stack([front, up, np.cross(front, up)], axis=1)
    return frame[list(_ZUP_TO_YUP), :].astype(np.float32), t, vals[9:11]


def load_depth_mm(tree, name):
    import cv2

    d = cv2.imdecode(np.frombuffer(tree.bytes(name), np.uint8), cv2.IMREAD_UNCHANGED)
    d = d.astype(np.float64)[..., None]
    d[d == 0] = 65535  # missing -> sentinel, culled by the validity filter
    return d


def load_rgb(tree, name):
    import cv2

    bgr = cv2.imdecode(np.frombuffer(tree.bytes(name), np.uint8), cv2.IMREAD_UNCHANGED)
    return bgr[..., :3][..., ::-1]


def load_semantic(tree, name):
    from PIL import Image

    return np.array(Image.open(io.BytesIO(tree.bytes(name))))[..., None]


def pinhole_points(depth, fx, fy):
    """Depth image + half-angle focal params -> camera-frame point grid
    (release convention: x-right/-y-down rays remapped to (z, -y, x))."""
    h, w = depth.shape[:2]
    ray_x = (np.arange(w, dtype=np.float64) - w / 2) * np.tan(fx) / (w / 2)
    ray_y = (np.arange(h, dtype=np.float64) - h / 2) * np.tan(fy) / (h / 2)
    px = depth[..., 0] * ray_x[None, :]
    py = depth[..., 0] * ray_y[:, None]
    pz = depth[..., 0]
    return np.stack([pz, -py, px], axis=-1)


def pano_points(depth):
    """Equirectangular depth -> camera-frame point grid (meters)."""
    h, w = depth.shape[:2]
    lon = (np.arange(w, dtype=np.float32) / w * 2 * np.pi - np.pi)[None, :, None]
    lat = (np.pi / 2 - np.arange(h, dtype=np.float32) / h * np.pi)[:, None, None]
    ray = np.concatenate(
        [
            np.cos(lon) * np.cos(lat),
            np.broadcast_to(np.sin(lat), (h, w, 1)),
            np.sin(lon) * np.cos(lat),
        ],
        axis=-1,
    )
    return depth * ray / 1000.0


def _keep_mask(cam_pts, normals, depth, segment):
    """Grazing-angle + missing-depth + unlabeled cull (release thresholds)."""
    dist = np.maximum(np.linalg.norm(cam_pts, axis=-1, keepdims=True), 1e-4)
    cos = np.abs(np.sum(cam_pts * normals / dist, axis=-1, keepdims=True))
    return ((cos > 0.15) & (depth < 65535) & (segment > 0))[..., 0].reshape(-1)


def _stash(buf, keep, world_pts, color, world_normals, segment):
    if keep.sum() == 0:
        return
    buf["coord"].append(world_pts.reshape(-1, 3)[keep])
    buf["color"].append(color.reshape(-1, 3)[keep])
    buf["normal"].append(world_normals.reshape(-1, 3)[keep])
    buf["segment"].append(segment.reshape(-1, 1)[keep])


def _fuse_perspective(tree, room_path, buf, scene, room):
    base = os.path.join(room_path, "perspective", "full")
    for frame in tree.child_dirs(base):
        try:
            R, t, f = load_camera(tree, os.path.join(base, frame, "camera_pose.txt"))
            depth = load_depth_mm(tree, os.path.join(base, frame, "depth.png"))
            color = load_rgb(tree, os.path.join(base, frame, "rgb_rawlight.png"))
            segment = load_semantic(tree, os.path.join(base, frame, "semantic.png"))
        except Exception:
            print(f"  skip {scene}/{room}/{frame} (load error)")
            continue
        cam_pts = pinhole_points(depth, f[0], f[1])
        keep = _keep_mask(cam_pts, grid_normals(cam_pts), depth, segment)
        world_pts = (cam_pts / 1000.0) @ R.T + t
        _stash(buf, keep, world_pts, color, grid_normals(world_pts), segment)


def _fuse_panorama(tree, room_path, buf, scene, room):
    base = os.path.join(room_path, "panorama")
    try:
        _, t, _ = load_camera(tree, os.path.join(base, "camera_xyz.txt"))
        depth = load_depth_mm(tree, os.path.join(base, "full", "depth.png"))
        color = load_rgb(tree, os.path.join(base, "full", "rgb_rawlight.png"))
        segment = load_semantic(tree, os.path.join(base, "full", "semantic.png"))
    except Exception:
        print(f"  skip {scene}/{room} panorama (load error)")
        return
    cam_pts = pano_points(depth)
    keep = _keep_mask(cam_pts, grid_normals(cam_pts), depth, segment)
    _stash(buf, keep, cam_pts + t, color, grid_normals(cam_pts), segment)


def parse_scene(scene, dataset_root, output_root, ignore_index=-1, grid_size=None,
                fuse_prsp=True, fuse_pano=True):
    assert fuse_prsp or fuse_pano
    tree = ZipTree(
        [os.path.join(dataset_root, f) for f in os.listdir(dataset_root) if f.endswith(".zip")]
    )
    scene_id = int(os.path.basename(scene).split("_")[-1])
    split = "train" if scene_id < 3000 else "val" if scene_id < 3250 else "test"
    print(f"processing {scene} -> {split}")

    nyu_to_25 = np.full(256, ignore_index, np.int64)
    for idx, nyu in enumerate(VALID_CLASS_IDS_25):
        nyu_to_25[nyu] = idx

    for room in tree.child_dirs(os.path.join("Structured3D", scene, "2D_rendering")):
        room_path = os.path.join("Structured3D", scene, "2D_rendering", room)
        buf = {"coord": [], "color": [], "normal": [], "segment": []}
        if fuse_prsp:
            _fuse_perspective(tree, room_path, buf, scene, room)
        if fuse_pano:
            _fuse_panorama(tree, room_path, buf, scene, room)
        if not buf["coord"]:
            continue

        coord = np.concatenate(buf["coord"]) @ _SAVE_SWAP
        normal = np.concatenate(buf["normal"]) @ _SAVE_SWAP
        segment = nyu_to_25[np.minimum(np.concatenate(buf["segment"]), 255)]
        data = dict(
            coord=coord.astype(np.float32),
            color=np.concatenate(buf["color"]).astype(np.uint8),
            normal=normal.astype(np.float32),
            segment=segment.astype(np.int16),
        )
        if grid_size is not None:
            grid = np.floor(coord / grid_size).astype(np.int64)
            _, first = np.unique(grid, axis=0, return_index=True)
            data = {k: v[first] for k, v in data.items()}
        save = os.path.join(output_root, split, f"{os.path.basename(scene)}_room_{room}")
        os.makedirs(save, exist_ok=True)
        for key, val in data.items():
            np.save(os.path.join(save, f"{key}.npy"), val)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", required=True, help="dir of Structured3D release zips")
    ap.add_argument("--output_root", required=True)
    ap.add_argument("--ignore_index", type=int, default=-1)
    ap.add_argument("--grid_size", type=float, default=None)
    ap.add_argument("--fuse_prsp", action="store_true", default=True)
    ap.add_argument("--no_pano", action="store_true")
    ap.add_argument("--num_workers", type=int, default=os.cpu_count())
    cfg = ap.parse_args()

    tree = ZipTree(
        [os.path.join(cfg.dataset_root, f) for f in os.listdir(cfg.dataset_root) if f.endswith(".zip")]
    )
    scenes = tree.child_dirs("Structured3D")
    print(f"{len(scenes)} scenes")
    with ProcessPoolExecutor(max_workers=cfg.num_workers) as pool:
        list(
            pool.map(
                parse_scene,
                scenes,
                repeat(cfg.dataset_root),
                repeat(cfg.output_root),
                repeat(cfg.ignore_index),
                repeat(cfg.grid_size),
                repeat(True),
                repeat(not cfg.no_pano),
            )
        )


if __name__ == "__main__":
    main()
