"""Synthetic datasets for tests and benchmarks (no reference analogue).

Deterministic procedurally-generated scenes/objects so the engine, evaluators
and benchmarks run without any downloaded data: room-like scenes with planar
floor/walls + blob objects for semseg, and ellipsoid "pig" clouds with
anatomically placed keypoints for the keypoint tasks.
"""

from __future__ import annotations

import numpy as np

from .builder import DATASETS
from .transform import Compose


def make_scene(rng: np.random.Generator, num_points: int, num_classes: int):
    """A toy room: floor plane, wall plane, and blobby objects (each blob is
    one INSTANCE; floor/wall get instance -1)."""
    n_floor = num_points // 3
    n_wall = num_points // 3
    n_obj = num_points - n_floor - n_wall
    floor = np.stack(
        [rng.uniform(0, 4, n_floor), rng.uniform(0, 4, n_floor), rng.normal(0, 0.01, n_floor)], 1
    )
    wall = np.stack(
        [rng.uniform(0, 4, n_wall), rng.normal(0, 0.01, n_wall), rng.uniform(0, 2, n_wall)], 1
    )
    objs = []
    labels = []
    inst_ids = []
    n_left = n_obj
    inst = 0
    while n_left > 0:
        k = int(min(rng.integers(200, 600), n_left))
        center = np.array([rng.uniform(0.5, 3.5), rng.uniform(0.5, 3.5), rng.uniform(0.2, 1.0)])
        pts = center + rng.normal(0, 0.15, (k, 3))
        # class is determined by blob height band -> learnable from geometry
        bands = max(num_classes - 2, 1)
        cls = 2 + min(int((center[2] - 0.2) / 0.8 * bands), bands - 1)
        objs.append(pts)
        labels.append(np.full(k, cls))
        inst_ids.append(np.full(k, inst))
        inst += 1
        n_left -= k
    coord = np.concatenate([floor, wall] + objs).astype(np.float32)
    segment = np.concatenate(
        [np.zeros(n_floor), np.ones(n_wall)] + labels
    ).astype(np.int32)
    segment = np.minimum(segment, num_classes - 1)
    instance = np.concatenate(
        [np.full(n_floor, -1), np.full(n_wall, -1)] + (inst_ids if inst_ids else [])
    ).astype(np.int32)
    # color carries a per-class tint + noise -> learnable from color too
    base = (coord - coord.min(0)) / (np.ptp(coord, axis=0) + 1e-6) * 60
    tint = np.stack([(segment * 53) % 256, (segment * 101) % 256, (segment * 197) % 256], 1)
    color = np.clip(0.7 * tint + base + rng.normal(0, 8, coord.shape), 0, 255)
    return coord, color.astype(np.float32), segment, instance


@DATASETS.register_module()
class SyntheticSemSegDataset:
    def __init__(
        self,
        split="train",
        num_scenes=8,
        num_points=8192,
        num_classes=6,
        transform=None,
        seed=0,
        loop=1,
        test_mode=False,
        test_cfg=None,
    ):
        from .transform import TRANSFORMS

        self.num_scenes = num_scenes
        self.num_points = num_points
        self.num_classes = num_classes
        self.transform = Compose(transform)
        self.seed = seed + (0 if split == "train" else 10_000)
        self.loop = loop if not test_mode else 1
        self.test_mode = test_mode
        self.test_cfg = test_cfg if test_mode else None
        if test_mode:
            tc = self.test_cfg or {}
            self.test_voxelize = TRANSFORMS.build(tc["voxelize"]) if tc.get("voxelize") else None
            self.test_crop = TRANSFORMS.build(tc["crop"]) if tc.get("crop") else None
            self.post_transform = Compose(tc.get("post_transform"))
            self.aug_transform = [Compose(aug) for aug in tc.get("aug_transform", [[]])]

    def get_data(self, idx):
        idx = idx % self.num_scenes
        rng = np.random.default_rng(self.seed + idx)
        coord, color, segment, instance = make_scene(rng, self.num_points, self.num_classes)
        return dict(
            coord=coord, color=color, segment=segment, instance=instance, name=f"scene{idx}"
        )

    def prepare_test_data(self, idx):
        from copy import deepcopy

        data_dict = self.transform(self.get_data(idx))
        result_dict = dict(segment=data_dict.pop("segment"), name=data_dict.pop("name"))
        fragment_list = []
        for aug in self.aug_transform:
            data = aug(deepcopy(data_dict))
            if self.test_voxelize is not None:
                parts = self.test_voxelize(data)
            else:
                data["index"] = np.arange(data["coord"].shape[0])
                parts = [data]
            for part in parts:
                fragment_list += self.test_crop(part) if self.test_crop else [part]
        result_dict["fragment_list"] = [self.post_transform(f) for f in fragment_list]
        return result_dict

    def __getitem__(self, idx):
        if self.test_mode:
            return self.prepare_test_data(idx)
        return self.transform(self.get_data(idx))

    def __len__(self):
        return self.num_scenes * self.loop


def make_pig(rng: np.random.Generator, num_points: int):
    """Ellipsoid body + keypoints at nose/tail/leg extremes (mm units)."""
    axes = np.array([600.0, 220.0, 260.0]) * rng.uniform(0.8, 1.2, 3)
    u = rng.normal(size=(num_points, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    r = rng.uniform(0.9, 1.0, (num_points, 1)) ** 0.3
    coord = (u * r * axes).astype(np.float32)
    center = rng.uniform(-50, 50, 3).astype(np.float32)
    coord += center
    normal = (u / np.maximum(np.linalg.norm(u, axis=1, keepdims=True), 1e-6)).astype(np.float32)
    curvature = rng.uniform(0, 1, (num_points, 1)).astype(np.float32)
    kp = np.array(
        [
            [axes[0], 0, 0],
            [-axes[0], 0, 0],
            [0, axes[1], 0],
            [0, -axes[1], 0],
            [0, 0, axes[2]],
            [0, 0, -axes[2]],
        ],
        np.float32,
    ) + center
    return coord, np.concatenate([normal, curvature], 1), kp


@DATASETS.register_module()
class SyntheticKeypointDataset:
    """Offset-keypoint flavored synthetic data (mm units, matching pigseg)."""

    def __init__(
        self,
        split="train",
        num_scenes=8,
        num_points=4096,
        num_keypoints=6,
        offset_radius=300.0,
        transform=None,
        seed=0,
        loop=1,
        test_mode=False,
        dense_targets=True,
    ):
        self.num_scenes = num_scenes
        self.num_points = num_points
        self.num_keypoints = num_keypoints
        self.offset_radius = offset_radius
        self.transform = Compose(transform)
        self.seed = seed + (0 if split == "train" else 10_000)
        self.loop = loop if not test_mode else 1
        self.test_mode = test_mode
        self.dense_targets = dense_targets

    def __getitem__(self, idx):
        idx = idx % self.num_scenes
        rng = np.random.default_rng(self.seed + idx)
        coord, feat, kp = make_pig(rng, self.num_points)
        centroid = coord.mean(0)
        coord = coord - centroid
        scale = float(np.sqrt((coord**2).sum(1)).max())
        coord = coord / scale
        kpn = (kp - centroid) / scale
        data = dict(
            coord=coord,
            feat=feat,
            keypoint=kpn.astype(np.float32),
            centroid=centroid.astype(np.float32),
            scale=np.float32(scale),
            name=f"pig{idx}",
        )
        if self.dense_targets:
            offsets = kpn[None, :, :] - coord[:, None, :]
            dist = np.linalg.norm(offsets, axis=-1) * scale
            mask = (dist <= self.offset_radius).astype(np.float32)
            data["keypoint_offset"] = (offsets * mask[..., None]).astype(np.float32)
            data["keypoint_mask"] = mask
        return self.transform(data)

    def __len__(self):
        return self.num_scenes * self.loop
