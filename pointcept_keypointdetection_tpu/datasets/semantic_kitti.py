"""SemanticKITTI dataset.

Parity surface: `pointcept/datasets/semantic_kitti.py` — sequence splits
(train 00-07,09,10 / val 08 / test 11-21, `:30-34`), raw ``.bin`` scan +
``.label`` readers (`:54-76`), the standard 19-class learning map with
ignore -1 (`:87-152`) and its inverse for submissions.  The learning-map
tables are the public semantic-kitti-api mapping.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from ..utils.logger import get_root_logger
from .builder import DATASETS
from .transform import Compose, TRANSFORMS

SPLIT_SEQUENCES = {
    "train": ["00", "01", "02", "03", "04", "05", "06", "07", "09", "10"],
    "val": ["08"],
    "test": ["11", "12", "13", "14", "15", "16", "17", "18", "19", "20", "21"],
}

# raw id -> train id (0..18, ignore = -1); public semantic-kitti-api mapping
LEARNING_MAP = {
    0: -1, 1: -1, 10: 0, 11: 1, 13: 4, 15: 2, 16: 4, 18: 3, 20: 4, 30: 5, 31: 6,
    32: 7, 40: 8, 44: 9, 48: 10, 49: 11, 50: 12, 51: 13, 52: -1, 60: 8, 70: 14,
    71: 15, 72: 16, 80: 17, 81: 18, 99: -1, 252: 0, 253: 6, 254: 5, 255: 7,
    256: 4, 257: 4, 258: 3, 259: 4,
}

# train id -> a canonical raw id (for submission writers)
LEARNING_MAP_INV = {
    -1: 0, 0: 10, 1: 11, 2: 15, 3: 18, 4: 20, 5: 30, 6: 31, 7: 32, 8: 40, 9: 44,
    10: 48, 11: 49, 12: 50, 13: 51, 14: 70, 15: 71, 16: 72, 17: 80, 18: 81,
}

# train ids whose raw classes are dynamic (movable) — the SLAM bridge drops
# these before feeding odometry (`SemanticFAST-LIO2-prediction/fusion_clean_bag.py:93-95`
# drops labels 0..7 = vehicles, persons, riders in train-id space)
DYNAMIC_CLASSES = tuple(range(8))


def _build_lut(mapping, default=-1):
    lut = np.full(max(mapping) + 1, default, dtype=np.int32)
    for k, v in mapping.items():
        lut[k] = v
    return lut


_LEARNING_LUT = _build_lut(LEARNING_MAP)


def read_scan(bin_path: str) -> np.ndarray:
    """Read a KITTI .bin scan -> (N, 4) xyz + reflectance."""
    return np.fromfile(bin_path, dtype=np.float32).reshape(-1, 4)


def read_label(label_path: str) -> np.ndarray:
    """Read .label -> train ids (semantic low 16 bits through the LUT)."""
    raw = np.fromfile(label_path, dtype=np.uint32) & 0xFFFF
    return _LEARNING_LUT[np.minimum(raw, len(_LEARNING_LUT) - 1)]


def map_to_raw_labels(train_ids: np.ndarray) -> np.ndarray:
    lut = np.zeros(20, np.uint32)
    for k, v in LEARNING_MAP_INV.items():
        if k >= 0:
            lut[k] = v
    return lut[np.maximum(train_ids, 0)].astype(np.uint32)


@DATASETS.register_module()
class SemanticKITTIDataset:
    def __init__(
        self,
        split="train",
        data_root="data/semantic_kitti",
        transform=None,
        test_mode=False,
        test_cfg=None,
        loop=1,
        ignore_index=-1,
    ):
        self.data_root = data_root
        self.split = split
        self.transform = Compose(transform)
        self.loop = loop if not test_mode else 1
        self.test_mode = test_mode
        self.test_cfg = test_cfg if test_mode else None
        self.ignore_index = ignore_index
        if test_mode:
            self.test_voxelize = (
                TRANSFORMS.build(self.test_cfg["voxelize"]) if self.test_cfg.get("voxelize") else None
            )
            self.test_crop = (
                TRANSFORMS.build(self.test_cfg["crop"]) if self.test_cfg.get("crop") else None
            )
            self.post_transform = Compose(self.test_cfg.get("post_transform"))
            self.aug_transform = [Compose(aug) for aug in self.test_cfg.get("aug_transform", [[]])]
        self.data_list = self.get_data_list()
        get_root_logger().info(
            "Totally %d x %d samples in %s set.", len(self.data_list), self.loop, split
        )

    def get_data_list(self):
        splits = [self.split] if isinstance(self.split, str) else self.split
        data_list = []
        for split in splits:
            for seq in SPLIT_SEQUENCES[split]:
                data_list += sorted(
                    glob.glob(os.path.join(self.data_root, "dataset", "sequences", seq, "velodyne", "*.bin"))
                )
        return data_list

    def get_data(self, idx):
        bin_path = self.data_list[idx % len(self.data_list)]
        scan = read_scan(bin_path)
        coord = scan[:, :3]
        strength = scan[:, 3:4]
        label_path = bin_path.replace("velodyne", "labels").replace(".bin", ".label")
        if os.path.exists(label_path):
            segment = read_label(label_path).astype(np.int32)
        else:
            segment = np.full(coord.shape[0], -1, np.int32)
        return dict(
            coord=coord, strength=strength, segment=segment, name=self.get_data_name(idx)
        )

    def get_data_name(self, idx):
        path = self.data_list[idx % len(self.data_list)]
        seq = os.path.basename(os.path.dirname(os.path.dirname(path)))
        frame = os.path.splitext(os.path.basename(path))[0]
        return f"{seq}_{frame}"

    def prepare_test_data(self, idx):
        from copy import deepcopy

        data_dict = self.get_data(idx)
        data_dict = self.transform(data_dict)
        result_dict = dict(segment=data_dict.pop("segment"), name=data_dict.pop("name"))
        data_dict_list = [aug(deepcopy(data_dict)) for aug in self.aug_transform]
        fragment_list = []
        for data in data_dict_list:
            if self.test_voxelize is not None:
                data_part_list = self.test_voxelize(data)
            else:
                data["index"] = np.arange(data["coord"].shape[0])
                data_part_list = [data]
            for part in data_part_list:
                fragment_list += self.test_crop(part) if self.test_crop else [part]
        result_dict["fragment_list"] = [self.post_transform(f) for f in fragment_list]
        return result_dict

    def __getitem__(self, idx):
        if self.test_mode:
            return self.prepare_test_data(idx)
        return self.transform(self.get_data(idx))

    def __len__(self):
        return len(self.data_list) * self.loop


@DATASETS.register_module()
class SemanticKITTIColorNormalDataset(SemanticKITTIDataset):
    """SemanticKITTI with radial pseudo-normals + color placeholders.

    Parity surface: `pointcept/datasets/semantic_kitti.py:154-185`
    (SemanticKITTIColorNormalDataset) — normals are the unit ray from the
    sensor center (cheap stand-in for o3d estimation), color/normal output
    slots are zero placeholders filled by downstream transforms."""

    @staticmethod
    def estimate_normals(points, center=np.array([0.0, 0.0, 0.0])):
        normals = points - center[None, :]
        norms = np.linalg.norm(normals, axis=1, keepdims=True)
        return normals / np.maximum(norms, 1e-9)

    def get_data(self, idx):
        data_dict = super().get_data(idx)
        coord = data_dict["coord"]
        data_dict["normal"] = self.estimate_normals(coord).astype(np.float32)
        data_dict["color"] = np.zeros_like(coord)
        return data_dict


def parse_calib_file(filepath):
    """KITTI calib.txt -> dict of matrices (P0..P3 3x4, Tr 3x4).

    Parity: `semantic_kitti.py:262-281`."""
    calib = {}
    with open(filepath) as f:
        for line in f.read().strip().split("\n"):
            if ":" not in line:
                continue
            key, values_str = line.split(":", 1)
            values = np.fromstring(values_str, dtype=np.float64, sep=" ")
            if values.size == 12:
                calib[key.strip()] = values.reshape(3, 4)
            elif values.size == 9:
                calib[key.strip()] = values.reshape(3, 3)
            else:
                calib[key.strip()] = values
    return calib


def project_lidar_to_image(coord, img_hw, cam_proj, lidar_to_cam):
    """Project lidar points through Tr then P; return (u, v) int pixel coords
    (-1 where the point misses the image) and the hit mask.

    Parity: `semantic_kitti.py:210-259` project_lidar_to_image_with_color."""
    n = coord.shape[0]
    uv = np.full((n, 2), -1, np.int32)
    hom = np.concatenate([coord, np.ones((n, 1))], axis=1)  # [N, 4]
    cam = (lidar_to_cam @ hom.T).T  # [N, 3] (Tr is 3x4)
    in_front = cam[:, 2] > 0
    cam_h = np.concatenate([cam, np.ones((n, 1))], axis=1)
    pts2d = (cam_proj @ cam_h.T).T  # P is 3x4 -> [N, 3]
    pts2d = pts2d[:, :2] / np.maximum(pts2d[:, 2:3], 1e-9)
    h, w = img_hw
    inside = in_front & (pts2d[:, 0] >= 0) & (pts2d[:, 0] < w) & (pts2d[:, 1] >= 0) & (pts2d[:, 1] < h)
    uv[inside] = pts2d[inside].astype(np.int32)
    return uv, inside


@DATASETS.register_module()
class SemanticKITTIImagePointDataset(SemanticKITTIDataset):
    """SemanticKITTI scans paired with camera frames + point->pixel
    correspondences, for joint 2D-3D SSL (Concerto on KITTI).

    Parity surface: `pointcept/datasets/semantic_kitti.py:188-430`
    (SemanticKITTIImagePointDataset): parses calib.txt, projects the scan into
    image_2/image_3, paints point colors from the pixels, and emits the same
    static-shape contract as ``ImagePointDataset``: ``images``
    [V, 3, patch_h*ps, patch_w*ps], ``correspondence`` [N, V, 2] (pixel coords
    in the resized frame, -1 = miss), ``img_valid`` [V]."""

    CAMERA_TYPES = (2, 3)

    def __init__(self, patch_size=14, patch_h=22, patch_w=74, max_images=2, **kwargs):
        self.patch_size = patch_size
        self.patch_h = patch_h
        self.patch_w = patch_w
        self.max_images = max_images
        super().__init__(**kwargs)

    def get_data(self, idx):
        from PIL import Image

        data_dict = super().get_data(idx)
        bin_path = self.data_list[idx % len(self.data_list)]
        coord = data_dict["coord"]
        n = coord.shape[0]
        th, tw = self.patch_h * self.patch_size, self.patch_w * self.patch_size

        images = np.zeros((self.max_images, 3, th, tw), np.float32)
        corr = np.full((n, self.max_images, 2), -1, np.int32)
        img_valid = np.zeros(self.max_images, bool)
        color = np.zeros((n, 3), np.float32)

        calib_path = os.path.join(os.path.dirname(os.path.dirname(bin_path)), "calib.txt")
        if os.path.exists(calib_path):
            calib = parse_calib_file(calib_path)
            for slot, cam in enumerate(self.CAMERA_TYPES[: self.max_images]):
                img_path = bin_path.replace("velodyne", f"image_{cam}").replace(".bin", ".png")
                if not os.path.exists(img_path) or f"P{cam}" not in calib:
                    continue
                img = Image.open(img_path).convert("RGB")
                w0, h0 = img.size
                uv, hit = project_lidar_to_image(coord, (h0, w0), calib[f"P{cam}"], calib["Tr"])
                arr = np.asarray(img, np.float32) / 255.0
                color[hit] = arr[uv[hit, 1], uv[hit, 0]]
                # center-crop to the patch grid then resize to the target
                div = max(min(w0 // self.patch_w, h0 // self.patch_h), 1)
                ch, cw = div * self.patch_h, div * self.patch_w
                top, left = (h0 - ch) // 2, (w0 - cw) // 2
                img_c = img.crop((left, top, left + cw, top + ch)).resize((tw, th))
                images[slot] = (np.asarray(img_c, np.float32) / 255.0).transpose(2, 0, 1)
                img_valid[slot] = True
                # correspondences in resized-frame pixels
                inside_crop = hit & (uv[:, 0] >= left) & (uv[:, 0] < left + cw) & (uv[:, 1] >= top) & (uv[:, 1] < top + ch)
                u = ((uv[inside_crop, 0] - left) * (tw / cw)).astype(np.int32)
                v = ((uv[inside_crop, 1] - top) * (th / ch)).astype(np.int32)
                corr[inside_crop, slot, 0] = np.clip(u, 0, tw - 1)
                corr[inside_crop, slot, 1] = np.clip(v, 0, th - 1)

        data_dict["color"] = color
        data_dict["images"] = images
        data_dict["correspondence"] = corr
        data_dict["img_valid"] = img_valid
        return data_dict
