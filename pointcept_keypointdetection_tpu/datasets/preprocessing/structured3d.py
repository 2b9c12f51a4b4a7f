"""Structured3D preprocessing: zipped pano/perspective renders -> npy scenes.

Parity surface: `pointcept/datasets/preprocessing/structured3d/
preprocess_structured3d.py` — read the release zips directly, unproject
perspective frames (pinhole from camera_pose.txt) and panoramas
(equirectangular), estimate normals from the image-grid cross product, filter
grazing/invalid pixels (|cos| > 0.15, valid depth, labeled), fuse per room,
map NYU ids to the 25-class benchmark, optional grid sampling, and save
coord/color/normal/segment npy dirs split by scene id (<3000 train,
3000-3249 val, rest test).
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


def normal_from_cross_product(points_2d: np.ndarray) -> np.ndarray:
    """Per-pixel normals from neighboring-pixel cross products
    (`preprocess_structured3d.py:77-87`)."""
    pad = np.pad(points_2d, ((0, 1), (0, 1), (0, 0)), mode="symmetric")
    ver = (pad[:, :-1, :] - pad[:, 1:, :])[:-1, :, :]
    hor = (pad[:-1, :, :] - pad[1:, :, :])[:, :-1, :]
    normal = np.cross(hor, ver)
    dist = np.linalg.norm(normal, axis=-1, keepdims=True)
    return np.divide(normal, dist, out=np.zeros_like(normal), where=dist != 0)


class Structured3DReader:
    """Random access over the set of release zips."""

    def __init__(self, files):
        if isinstance(files, str):
            files = [files]
        self.readers = [zipfile.ZipFile(f, "r") for f in files]
        self.names_mapper = {}
        for idx, reader in enumerate(self.readers):
            for name in reader.namelist():
                self.names_mapper[name] = idx

    def filelist(self):
        return list(self.names_mapper)

    def listdir(self, dir_name):
        dir_name = dir_name.strip("/") + "/"
        out = {
            f[len(dir_name):].split("/")[0]
            for f in self.names_mapper
            if f.startswith(dir_name)
        }
        out.discard("")
        return sorted(out)

    def read(self, name):
        return self.readers[self.names_mapper[name]].read(name)

    def read_camera(self, camera_path):
        z2y = np.array([[0, 1, 0], [0, 0, 1], [1, 0, 0]], np.float32)
        ext = np.fromstring(self.read(camera_path), dtype=np.float32, sep=" ")
        cam_t = z2y @ (ext[:3] / 1000)
        if ext.shape[0] > 3:
            front, up = ext[3:6], ext[6:9]
            n = np.cross(front, up)
            cam_r = z2y @ np.stack((front, up, n), axis=1).astype(np.float32)
            cam_f = ext[9:11]
        else:
            cam_r, cam_f = np.eye(3, dtype=np.float32), None
        return cam_r, cam_t, cam_f

    def read_depth(self, path):
        import cv2

        depth = cv2.imdecode(np.frombuffer(self.read(path), np.uint8), cv2.IMREAD_UNCHANGED)[..., None]
        depth = depth.astype(np.float64)
        depth[depth == 0] = 65535
        return depth

    def read_color(self, path):
        import cv2

        return cv2.imdecode(np.frombuffer(self.read(path), np.uint8), cv2.IMREAD_UNCHANGED)[..., :3][..., ::-1]

    def read_segment(self, path):
        from PIL import Image

        return np.array(Image.open(io.BytesIO(self.read(path))))[..., None]


def _filter_and_collect(coord, color, normal, segment, depth, lists):
    view_dist = np.maximum(np.linalg.norm(coord, axis=-1, keepdims=True), 1e-4)
    cosine = np.abs(np.sum(coord * normal / view_dist, axis=-1, keepdims=True))
    mask = ((cosine > 0.15) & (depth < 65535) & (segment > 0))[..., 0].reshape(-1)
    if mask.sum() == 0:
        return False
    lists[0].append(coord.reshape(-1, 3)[mask])
    lists[1].append(color.reshape(-1, 3)[mask])
    lists[2].append(normal.reshape(-1, 3)[mask])
    lists[3].append(segment.reshape(-1, 1)[mask])
    return True


def parse_scene(scene, dataset_root, output_root, ignore_index=-1, grid_size=None,
                fuse_prsp=True, fuse_pano=True):
    assert fuse_prsp or fuse_pano
    reader = Structured3DReader(
        [os.path.join(dataset_root, f) for f in os.listdir(dataset_root) if f.endswith(".zip")]
    )
    scene_id = int(os.path.basename(scene).split("_")[-1])
    split = "train" if scene_id < 3000 else "val" if scene_id < 3250 else "test"
    print(f"processing {scene} -> {split}")

    for room in reader.listdir(os.path.join("Structured3D", scene, "2D_rendering")):
        room_path = os.path.join("Structured3D", scene, "2D_rendering", room)
        lists = ([], [], [], [])
        if fuse_prsp:
            prsp = os.path.join(room_path, "perspective", "full")
            for frame in reader.listdir(prsp):
                try:
                    cam_r, cam_t, cam_f = reader.read_camera(os.path.join(prsp, frame, "camera_pose.txt"))
                    depth = reader.read_depth(os.path.join(prsp, frame, "depth.png"))
                    color = reader.read_color(os.path.join(prsp, frame, "rgb_rawlight.png"))
                    segment = reader.read_segment(os.path.join(prsp, frame, "semantic.png"))
                except Exception:
                    print(f"  skip {scene}/{room}/{frame} (load error)")
                    continue
                fx, fy = cam_f
                h, w = depth.shape[:2]
                pixel = np.transpose(np.indices((w, h)), (2, 1, 0)).reshape(-1, 2)
                pixel = np.hstack((pixel, np.ones((pixel.shape[0], 1))))
                k = np.diag([1.0, 1.0, 1.0])
                k[0, 2], k[1, 2] = w / 2, h / 2
                k[0, 0], k[1, 1] = k[0, 2] / np.tan(fx), k[1, 2] / np.tan(fy)
                coord = (depth.reshape(-1, 1) * (np.linalg.inv(k) @ pixel.T).T).reshape(h, w, 3)
                coord = coord @ np.array([[0, 0, 1], [0, -1, 0], [1, 0, 0]])
                normal = normal_from_cross_product(coord)
                cam_coord = np.matmul(coord / 1000, cam_r.T) + cam_t
                # filter in camera frame, collect in world frame
                view_dist = np.maximum(np.linalg.norm(coord, axis=-1, keepdims=True), 1e-4)
                cosine = np.abs(np.sum(coord * normal / view_dist, axis=-1, keepdims=True))
                mask = ((cosine > 0.15) & (depth < 65535) & (segment > 0))[..., 0].reshape(-1)
                world_normal = normal_from_cross_product(cam_coord)
                if mask.sum() > 0:
                    lists[0].append(cam_coord.reshape(-1, 3)[mask])
                    lists[1].append(color.reshape(-1, 3)[mask])
                    lists[2].append(world_normal.reshape(-1, 3)[mask])
                    lists[3].append(segment.reshape(-1, 1)[mask])

        if fuse_pano:
            pano = os.path.join(room_path, "panorama")
            try:
                _, cam_t, _ = reader.read_camera(os.path.join(pano, "camera_xyz.txt"))
                depth = reader.read_depth(os.path.join(pano, "full", "depth.png"))
                color = reader.read_color(os.path.join(pano, "full", "rgb_rawlight.png"))
                segment = reader.read_segment(os.path.join(pano, "full", "semantic.png"))
            except Exception:
                print(f"  skip {scene}/{room} panorama (load error)")
            else:
                ph, pw = depth.shape[:2]
                pa = (np.arange(pw, dtype=np.float32) / pw * 2 * np.pi - np.pi)[None, :, None]
                pb = (np.arange(ph, dtype=np.float32) / ph * np.pi * -1 + np.pi / 2)[:, None, None]
                x = depth * np.cos(pa) * np.cos(pb)
                y = depth * np.sin(pb)
                z = depth * np.sin(pa) * np.cos(pb)
                coord = np.concatenate([x, y, z], axis=-1) / 1000
                normal = normal_from_cross_product(coord)
                if _filter_and_collect(coord + 0, color, normal, segment, depth, lists):
                    lists[0][-1] = lists[0][-1] + cam_t

        if lists[0]:
            swap = np.array([[1, 0, 0], [0, 0, 1], [0, 1, 0]])
            coord = np.concatenate(lists[0], axis=0) @ swap
            color = np.concatenate(lists[1], axis=0)
            normal = np.concatenate(lists[2], axis=0) @ swap
            segment = np.concatenate(lists[3], axis=0)
            segment25 = np.full_like(segment, ignore_index, dtype=np.int64)
            for idx, value in enumerate(VALID_CLASS_IDS_25):
                segment25[segment == value] = idx
            data = dict(
                coord=coord.astype(np.float32),
                color=color.astype(np.uint8),
                normal=normal.astype(np.float32),
                segment=segment25.astype(np.int16),
            )
            if grid_size is not None:
                grid = np.floor(coord / grid_size).astype(np.int64)
                _, idx = np.unique(grid, axis=0, return_index=True)
                data = {k: v[idx] for k, v in data.items()}
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

    reader = Structured3DReader(
        [os.path.join(cfg.dataset_root, f) for f in os.listdir(cfg.dataset_root) if f.endswith(".zip")]
    )
    scenes = reader.listdir("Structured3D")
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
