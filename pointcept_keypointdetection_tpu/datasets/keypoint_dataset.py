"""Keypoint datasets (the fork's pig-body keypoint benchmark).

Parity surface:
* ``KeypointDataset`` (`pointcept/datasets/keypoint_dataset.py`): pairs
  ``<split>/pointclouds/<ts>.npy`` (N x 7: xyz + normal + curvature) with
  ``<split>/keypoints/<ts>_关键点坐标.npy`` (K x 3); NaN/shape defenses with
  random resample; centroid-centering + max-radius normalization keeping
  ``scale``/``centroid`` for de-normalization; keypoints normalized with the
  same transform.
* ``OffsetKeypointDataset`` (`offset_keypoint_dataset.py`): same pairing;
  dense per-point targets (N, K, 4) = (offset xyz, mask) either precomputed
  (``*_keypoint_offset.npy``) or generated online with
  ``offset = keypoint - point``, ``mask = |offset| <= offset_radius``
  (`offset_keypoint_dataset.py:92-111`); centering leaves offsets unchanged,
  scaling divides offsets by ``scale`` (`:164-181`).

This build stores the dense target as two keys — ``keypoint_offset`` (N, K, 3)
and ``keypoint_mask`` (N, K) — which ride the padded collation natively.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np

from ..utils.logger import get_root_logger
from .builder import DATASETS
from .transform import Compose

KEYPOINT_LABEL_SUFFIX = "_关键点坐标"


def _find_keypoint_path(kp_dir: str, timestamp: str) -> Optional[str]:
    for candidate in (f"{timestamp}{KEYPOINT_LABEL_SUFFIX}.npy", f"{timestamp}.npy"):
        path = os.path.join(kp_dir, candidate)
        if os.path.exists(path):
            return path
    return None


class _KeypointBase:
    def __init__(self, split, data_root, transform, test_mode, loop, num_keypoints):
        self.data_root = data_root
        self.split = split
        self.num_keypoints = num_keypoints
        self.transform = Compose(transform)
        self.test_mode = test_mode
        self.loop = loop if not test_mode else 1
        self.data_list = self._get_file_list()
        get_root_logger().info(
            "[%s] %d keypoint samples under %s", split, len(self.data_list), data_root
        )

    def _get_file_list(self):
        split_path = os.path.join(self.data_root, self.split)
        if not os.path.exists(split_path):
            raise ValueError(f"data path missing: {split_path}")
        data_list = []
        for feat_path in sorted(glob.glob(os.path.join(split_path, "pointclouds", "*.npy"))):
            timestamp = os.path.splitext(os.path.basename(feat_path))[0]
            kp_path = _find_keypoint_path(os.path.join(split_path, "keypoints"), timestamp)
            if kp_path is None:
                get_root_logger().warning("no keypoint label for %s", timestamp)
                continue
            data_list.append(dict(feat_path=feat_path, keypoint_path=kp_path, name=timestamp))
        return data_list

    def _load_cloud(self, info):
        raw = np.load(info["feat_path"]).astype(np.float32)
        coord = np.nan_to_num(raw[:, 0:3])
        feat = np.nan_to_num(raw[:, 3:])
        return coord, feat

    def _load_keypoints(self, info):
        kp = np.load(info["keypoint_path"]).astype(np.float32)
        kp = np.nan_to_num(kp)
        if kp.ndim == 1 and kp.size % 3 == 0:
            kp = kp.reshape(-1, 3)
        if kp.shape != (self.num_keypoints, 3):
            return None
        return kp

    def __len__(self):
        return len(self.data_list) * self.loop


@DATASETS.register_module()
class KeypointDataset(_KeypointBase):
    """Global-regression targets: normalized (K, 3) keypoints per cloud."""

    def __init__(
        self,
        split="train",
        data_root="data",
        transform=None,
        test_mode=False,
        loop=1,
        num_keypoints=6,
    ):
        super().__init__(split, data_root, transform, test_mode, loop, num_keypoints)

    def __getitem__(self, idx):
        info = self.data_list[idx % len(self.data_list)]
        coord, feat = self._load_cloud(info)
        keypoint = self._load_keypoints(info)
        if keypoint is None or coord.shape[0] == 0:
            return self[np.random.randint(0, len(self.data_list))]
        centroid = coord.mean(axis=0)
        coord = coord - centroid
        scale = float(np.sqrt((coord**2).sum(axis=1)).max())
        scale = scale if scale > 1e-6 else 1.0
        coord = coord / scale
        keypoint = (keypoint - centroid) / scale
        data_dict = dict(
            coord=coord,
            feat=feat,
            keypoint=keypoint.astype(np.float32),
            name=info["name"],
            centroid=centroid.astype(np.float32),
            scale=np.float32(scale),
        )
        return self.transform(data_dict)


@DATASETS.register_module()
class OffsetKeypointDataset(_KeypointBase):
    """Dense offset+mask targets per point."""

    def __init__(
        self,
        split="train",
        data_root="data",
        transform=None,
        test_mode=False,
        loop=1,
        offset_radius=None,
        online_offset=None,
        num_keypoints=6,
    ):
        self.offset_radius = None if offset_radius is None else float(offset_radius)
        self.online_offset = (
            self.offset_radius is not None if online_offset is None else online_offset
        )
        if self.online_offset and self.offset_radius is None:
            raise ValueError("online_offset=True requires offset_radius")
        super().__init__(split, data_root, transform, test_mode, loop, num_keypoints)

    def _get_file_list(self):
        if self.online_offset:
            return super()._get_file_list()
        split_path = os.path.join(self.data_root, self.split)
        data_list = []
        for feat_path in sorted(glob.glob(os.path.join(split_path, "pointclouds", "*.npy"))):
            timestamp = os.path.splitext(os.path.basename(feat_path))[0]
            label_path = os.path.join(split_path, "keypoints", f"{timestamp}_keypoint_offset.npy")
            if os.path.exists(label_path):
                data_list.append(dict(feat_path=feat_path, label_path=label_path, name=timestamp))
        return data_list

    def _offset_target(self, coord, keypoint):
        offsets = keypoint[None, :, :] - coord[:, None, :]  # (N, K, 3)
        dist = np.linalg.norm(offsets, axis=-1)
        mask = (dist <= self.offset_radius).astype(np.float32)
        return offsets * mask[..., None], mask

    def __getitem__(self, idx):
        info = self.data_list[idx % len(self.data_list)]
        coord, feat = self._load_cloud(info)
        if coord.shape[0] == 0:
            return self[np.random.randint(0, len(self.data_list))]
        if self.online_offset:
            keypoint = self._load_keypoints(info)
            if keypoint is None:
                return self[np.random.randint(0, len(self.data_list))]
            offset, mask = self._offset_target(coord, keypoint)
        else:
            target = np.nan_to_num(np.load(info["label_path"]).astype(np.float32))
            if target.ndim != 3 or target.shape[1:] != (self.num_keypoints, 4) or target.shape[0] != coord.shape[0]:
                return self[np.random.randint(0, len(self.data_list))]
            offset, mask = target[..., :3], target[..., 3]
            keypoint = None

        centroid = coord.mean(axis=0)
        coord = coord - centroid
        scale = float(np.sqrt((coord**2).sum(axis=1)).max())
        scale = scale if scale > 1e-6 else 1.0
        coord = coord / scale
        offset = offset / scale

        data_dict = dict(
            coord=coord,
            feat=feat,
            keypoint_offset=offset.astype(np.float32),
            keypoint_mask=mask.astype(np.float32),
            name=info["name"],
            centroid=centroid.astype(np.float32),
            scale=np.float32(scale),
        )
        if keypoint is not None:
            data_dict["keypoint"] = ((keypoint - centroid) / scale).astype(np.float32)
        return self.transform(data_dict)
