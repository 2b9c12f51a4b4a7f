"""NuScenes and Waymo outdoor datasets.

Parity surface: `pointcept/datasets/nuscenes.py` / `waymo.py` — the
info-pkl + raw-bin nuScenes reader with the 32->16 lidarseg learning map and
submission-ready tokens (`nuscenes.py:23-133`), the ColorNormal variant
(`:134-172`), and the Waymo reader with multi-frame temporal aggregation
(pose-aligned neighbor frames, optional timing embedding / reference-label
masking, `waymo.py:18-108`).  Both also read this repo's own preprocessing
outputs (per-frame npy asset dirs) when no info pickle is present.
"""

from __future__ import annotations

import glob
import os
import pickle

import numpy as np

from .builder import DATASETS
from .defaults import DefaultDataset

NUSCENES_CLASS_NAMES = (
    "barrier", "bicycle", "bus", "car", "construction_vehicle", "motorcycle",
    "pedestrian", "traffic_cone", "trailer", "truck", "driveable_surface",
    "other_flat", "sidewalk", "terrain", "manmade", "vegetation",
)

WAYMO_CLASS_NAMES = (
    "Car", "Truck", "Bus", "Other Vehicle", "Motorcyclist", "Bicyclist",
    "Pedestrian", "Sign", "Traffic Light", "Pole", "Construction Cone",
    "Bicycle", "Motorcycle", "Building", "Vegetation", "Tree Trunk",
    "Curb", "Road", "Lane Marker", "Other Ground", "Walkable", "Sidewalk",
)


def nuscenes_learning_map(ignore_index: int = -1):
    """Raw lidarseg (0..31) -> 16 training classes (`nuscenes.py:95-130`)."""
    m = {i: ignore_index for i in range(32)}
    m.update({2: 6, 3: 6, 4: 6, 6: 6, 9: 0, 12: 7, 14: 1, 15: 2, 16: 2, 17: 3,
              18: 4, 21: 5, 22: 8, 23: 9, 24: 10, 25: 11, 26: 12, 27: 13,
              28: 14, 30: 15})
    return m


def _estimate_normals(points, center=(0.0, 0.0, 0.0)):
    """Unit vectors from each point toward the sensor (the reference's cheap
    normal proxy for lidar scans, `nuscenes.py:136-141`)."""
    d = np.asarray(center, np.float32) - points
    n = np.linalg.norm(d, axis=1, keepdims=True)
    return (d / np.maximum(n, 1e-8)).astype(np.float32)


@DATASETS.register_module()
class NuScenesDataset(DefaultDataset):
    class_names = NUSCENES_CLASS_NAMES

    def __init__(self, sweeps=10, ignore_index=-1, **kwargs):
        self.sweeps = sweeps
        self.ignore_index = ignore_index
        self.learning_map = nuscenes_learning_map(ignore_index)
        self._lut = np.full(64, ignore_index, np.int64)
        for k, v in self.learning_map.items():
            self._lut[k] = v
        super().__init__(ignore_index=ignore_index, **kwargs)

    def get_info_path(self, split):
        return os.path.join(
            self.data_root, "info", f"nuscenes_infos_{self.sweeps}sweeps_{split}.pkl"
        )

    def get_data_list(self):
        split = [self.split] if isinstance(self.split, str) else list(self.split)
        if all(os.path.isfile(self.get_info_path(s)) for s in split):
            # reference mode: preprocessed info pickles over the raw release
            data_list = []
            for s in split:
                with open(self.get_info_path(s), "rb") as f:
                    data_list.extend(pickle.load(f))
            return data_list
        # fallback: this repo's own npy asset dirs
        data_list = []
        for s in split:
            data_list += glob.glob(os.path.join(self.data_root, s, "*"))
        return sorted(data_list)

    def get_data(self, idx):
        data = self.data_list[idx % len(self.data_list)]
        if not isinstance(data, dict):
            return super().get_data(idx)
        # info mode: raw 5-float bins + uint8 lidarseg (`nuscenes.py:61-88`)
        points = np.fromfile(
            os.path.join(self.data_root, "raw", data["lidar_path"]), dtype=np.float32
        ).reshape(-1, 5)
        coord = points[:, :3]
        strength = points[:, 3].reshape(-1, 1) / 255.0
        if "gt_segment_path" in data:
            raw = np.fromfile(
                os.path.join(self.data_root, "raw", data["gt_segment_path"]),
                dtype=np.uint8,
            ).reshape(-1)
            segment = self._lut[np.minimum(raw, len(self._lut) - 1)]
        else:
            segment = np.full(coord.shape[0], self.ignore_index, np.int64)
        return dict(
            coord=coord, strength=strength, segment=segment, name=self.get_data_name(idx)
        )

    def get_data_name(self, idx):
        data = self.data_list[idx % len(self.data_list)]
        if isinstance(data, dict):
            return data["lidar_token"]
        return super().get_data_name(idx)


@DATASETS.register_module()
class NuScenesColorNormalDataset(NuScenesDataset):
    """Adds sensor-direction normals (reference `nuscenes.py:134-172`)."""

    def get_data(self, idx):
        data = super().get_data(idx)
        if "normal" not in data:
            data["normal"] = _estimate_normals(data["coord"])
        return data


@DATASETS.register_module()
class WaymoDataset(DefaultDataset):
    class_names = WAYMO_CLASS_NAMES

    def __init__(self, timestamp=(0,), reference_label=True, timing_embedding=False, **kwargs):
        assert timestamp[0] == 0
        self.timestamp = tuple(timestamp)
        self.reference_label = reference_label
        self.timing_embedding = timing_embedding
        super().__init__(**kwargs)
        self.data_list = sorted(self.data_list)
        _, self.sequence_offset, self.sequence_index = np.unique(
            [os.path.dirname(d) for d in self.data_list],
            return_index=True,
            return_inverse=True,
        )
        self.sequence_offset = np.append(
            np.sort(self.sequence_offset), len(self.data_list)
        )

    def get_data_list(self):
        split = [self.split] if isinstance(self.split, str) else self.split
        data_list = []
        for s in split:
            # waymo layout: <root>/<split>/<sequence>/<frame>/
            data_list += glob.glob(os.path.join(self.data_root, s, "*", "*"))
        return sorted(data_list)

    @staticmethod
    def align_pose(coord, pose, target_pose):
        """Transform coords from ``pose``'s frame into ``target_pose``'s
        (`waymo.py:76-81`)."""
        hom = np.hstack([coord, np.ones_like(coord[:, :1])])
        rel = np.linalg.inv(target_pose) @ pose
        return (rel @ hom.T).T[:, :3].astype(coord.dtype)

    def get_single_frame(self, idx):
        return super().get_data(idx)

    def get_data(self, idx):
        idx = idx % len(self.data_list)
        if self.timestamp == (0,):
            return self.get_single_frame(idx)
        # temporal aggregation (`waymo.py:57-108`): pose-align neighbor
        # frames into the major frame; optionally mask their labels and
        # append a per-point timestamp channel to strength
        seq = self.sequence_index[idx]
        lower, upper = self.sequence_offset[seq], self.sequence_offset[seq + 1]
        major = self.get_single_frame(idx)
        name = major.pop("name")
        target_pose = major.pop("pose")
        parts = {k: [v] for k, v in major.items()}
        if self.timing_embedding and "strength" in parts:
            parts["strength"] = [
                np.hstack([parts["strength"][0], np.zeros_like(parts["strength"][0])])
            ]
        for ts in self.timestamp[1:]:
            ref_idx = idx + ts
            if ref_idx < lower or ref_idx >= upper:
                continue
            ref = self.get_single_frame(ref_idx)
            ref.pop("name", None)
            pose = ref.pop("pose")
            ref["coord"] = self.align_pose(ref["coord"], pose, target_pose)
            if not self.reference_label and "segment" in ref:
                ref["segment"] = np.full_like(ref["segment"], self.ignore_index)
            if self.timing_embedding and "strength" in ref:
                ref["strength"] = np.hstack(
                    [ref["strength"], np.full_like(ref["strength"], ts)]
                )
            for k in parts:
                if k in ref:
                    parts[k].append(ref[k])
        out = {k: np.concatenate(v, axis=0) for k, v in parts.items()}
        out["name"] = name
        return out

    def get_data_name(self, idx):
        path = self.data_list[idx % len(self.data_list)]
        return f"{os.path.basename(os.path.dirname(path))}_{os.path.basename(path)}"
