"""ScanNet frame-pair dataset (PointContrast-style contrastive views).

Parity surface: `pointcept/datasets/scannet_pair.py:23-97` —
``ScanNetPairDataset`` walks ``<scene>/pcd/overlap.txt`` manifests, keeps
frame pairs whose overlap ratio exceeds ``overlap_threshold``, loads the two
partial-frame point clouds, applies independent view transforms, and emits
one dict with ``view1_*`` / ``view2_*`` key prefixes (the collation layer
already understands those prefixes and pads each view independently).

Storage contract (TPU build): frames are ``.npz`` files with at least a
``coord`` array (``color``/``normal`` optional), as written by
``datasets/preprocessing/scannet_pair.py``.  The reference stores torch
pickles; .npz keeps the loader torch-free.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from ..utils.logger import get_root_logger
from .builder import DATASETS
from .transform import Compose


def _load_frame(path: str) -> dict:
    data = np.load(path, allow_pickle=False)
    out = {"coord": data["coord"].astype(np.float32)}
    for key in ("color", "normal"):
        if key in data:
            out[key] = data[key].astype(np.float32)
    return out


@DATASETS.register_module()
class ScanNetPairDataset:
    def __init__(
        self,
        data_root="data/scannet_pair",
        overlap_threshold=0.3,
        view1_transform=None,
        view2_transform=None,
        view_keys=("coord", "color"),
        match_grid=0.05,
        loop=1,
        **kwargs,
    ):
        self.data_root = data_root
        self.overlap_threshold = overlap_threshold
        self.view1_transform = Compose(view1_transform)
        self.view2_transform = Compose(view2_transform)
        self.view_keys = view_keys
        self.match_grid = match_grid
        self.loop = loop
        self.data_list = self.get_data_list()
        get_root_logger().info(
            "Totally %d x %d samples.", len(self.data_list), self.loop
        )

    def get_data_list(self):
        data_list = []
        for overlap_file in sorted(
            glob.glob(os.path.join(self.data_root, "*", "pcd", "overlap.txt"))
        ):
            with open(overlap_file) as f:
                pairs = [line.strip().split() for line in f if line.strip()]
            data_list.extend(
                [pair[:2] for pair in pairs if float(pair[2]) > self.overlap_threshold]
            )
        return data_list

    def get_data(self, idx):
        pair = self.data_list[idx % len(self.data_list)]
        view1 = _load_frame(os.path.join(self.data_root, pair[0].lstrip(os.sep)))
        view2 = _load_frame(os.path.join(self.data_root, pair[1].lstrip(os.sep)))
        return view1, view2

    def get_data_name(self, idx):
        return os.path.basename(self.data_list[idx % len(self.data_list)][0]).split(".")[0]

    def __getitem__(self, idx):
        """Emit the MSC view contract ``view{1,2}_{coord,feat,grid_coord,
        origin}`` (+ ``view1_color_target``).

        The two frames are registered partial scans of one scene; exact-origin
        correspondence (what ``ContrastiveViewsGenerator`` gets for free from
        row indices) is recovered by stamping each point with its world-voxel
        id at ``match_grid`` resolution *before* the per-view augmentations —
        both frames see the same world grid, so equal ids are correspondences
        (the reference matches pairs by spatial proximity instead,
        `masked_scene_contrast_v1m1_base.py` match computation).  The codes
        are then compacted to per-sample indices (match_views packs origins
        into 24 bits).
        """
        views = []
        for view, trans in zip(self.get_data(idx), (self.view1_transform, self.view2_transform)):
            g = np.floor(view["coord"] / self.match_grid).astype(np.int64) & 0x1FFFFF
            view["origin"] = (g[:, 0] << 42) | (g[:, 1] << 21) | g[:, 2]
            view["index_valid_keys"] = [
                k for k, v in view.items() if isinstance(v, np.ndarray)
            ] + ["grid_coord"]
            views.append(trans(view))

        # compact world-voxel codes -> small per-sample ids
        o1, o2 = views[0]["origin"], views[1]["origin"]
        _, inv = np.unique(np.concatenate([o1, o2]), return_inverse=True)
        views[0]["origin"], views[1]["origin"] = inv[: len(o1)], inv[len(o1):]

        data_dict = {}
        for i, view in enumerate(views, start=1):
            n = len(view["coord"])
            feats = [
                view[k].reshape(n, -1).astype(np.float32)
                for k in self.view_keys
                if k != "coord" and k in view
            ]
            data_dict[f"view{i}_coord"] = view["coord"].astype(np.float32)
            data_dict[f"view{i}_feat"] = (
                np.concatenate(feats, axis=1) if feats else view["coord"].astype(np.float32)
            )
            data_dict[f"view{i}_grid_coord"] = view.get(
                "grid_coord", np.zeros((n, 3), dtype=np.int64)
            ).astype(np.int64)
            data_dict[f"view{i}_origin"] = view["origin"].astype(np.int64)
            if i == 1 and "color" in view:
                data_dict["view1_color_target"] = view["color"].astype(np.float32)
        # primary cloud for PointBatch plumbing (view1)
        data_dict["coord"] = data_dict["view1_coord"]
        data_dict["feat"] = data_dict["view1_feat"]
        data_dict["grid_coord"] = data_dict["view1_grid_coord"]
        return data_dict

    def __len__(self):
        return len(self.data_list) * self.loop
