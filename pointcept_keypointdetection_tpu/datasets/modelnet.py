"""ModelNet40 (classification) and ShapeNetPart (part segmentation).

Parity surface: `pointcept/datasets/modelnet.py` (txt point files / cached
npy, voting test via ClsVotingTester) and `shapenet_part.py`.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from ..utils.logger import get_root_logger
from .builder import DATASETS
from .transform import Compose

MODELNET40_CLASSES = (
    "airplane", "bathtub", "bed", "bench", "bookshelf", "bottle", "bowl", "car", "chair",
    "cone", "cup", "curtain", "desk", "door", "dresser", "flower_pot", "glass_box",
    "guitar", "keyboard", "lamp", "laptop", "mantel", "monitor", "night_stand", "person",
    "piano", "plant", "radio", "range_hood", "sink", "sofa", "stairs", "stool", "table",
    "tent", "toilet", "tv_stand", "vase", "wardrobe", "xbox",
)


@DATASETS.register_module()
class ModelNetDataset:
    """Expects <root>/<class>/<class>_XXXX.npy of (N, 6) xyz+normal, plus
    <root>/modelnet40_{train,test}.txt listing sample names (official split)."""

    class_names = MODELNET40_CLASSES

    def __init__(self, split="train", data_root="data/modelnet40", transform=None,
                 num_points=8192, test_mode=False, loop=1):
        self.data_root = data_root
        self.split = split
        self.num_points = num_points
        self.transform = Compose(transform)
        self.test_mode = test_mode
        self.loop = loop if not test_mode else 1
        split_file = os.path.join(data_root, f"modelnet40_{'train' if split == 'train' else 'test'}.txt")
        if os.path.exists(split_file):
            self.data_list = [line.strip() for line in open(split_file)]
        else:
            self.data_list = sorted(
                os.path.splitext(os.path.basename(p))[0]
                for p in glob.glob(os.path.join(data_root, "*", "*.npy"))
            )
        get_root_logger().info("[%s] %d ModelNet samples", split, len(self.data_list))

    def __getitem__(self, idx):
        name = self.data_list[idx % len(self.data_list)]
        cls_name = "_".join(name.split("_")[:-1])
        raw = np.load(os.path.join(self.data_root, cls_name, f"{name}.npy")).astype(np.float32)
        if len(raw) > self.num_points:
            raw = raw[np.random.choice(len(raw), self.num_points, replace=False)]
        data = dict(
            coord=raw[:, :3],
            normal=raw[:, 3:6] if raw.shape[1] >= 6 else np.zeros_like(raw[:, :3]),
            category=np.asarray([self.class_names.index(cls_name)], np.int32),
            name=name,
        )
        return self.transform(data)

    def __len__(self):
        return len(self.data_list) * self.loop


@DATASETS.register_module()
class ShapeNetPartDataset:
    """Expects preprocessed <root>/<split>/<name>.npy of (N, 7) xyz+normal+part
    and category index encoded in a sibling json/txt (simplified layout)."""

    def __init__(self, split="train", data_root="data/shapenetpart", transform=None,
                 test_mode=False, loop=1):
        self.data_root = data_root
        self.split = split
        self.transform = Compose(transform)
        self.test_mode = test_mode
        self.loop = loop if not test_mode else 1
        self.data_list = sorted(glob.glob(os.path.join(data_root, split, "*.npy")))
        get_root_logger().info("[%s] %d ShapeNetPart samples", split, len(self.data_list))

    def __getitem__(self, idx):
        path = self.data_list[idx % len(self.data_list)]
        raw = np.load(path).astype(np.float32)
        data = dict(
            coord=raw[:, :3],
            normal=raw[:, 3:6],
            segment=raw[:, 6].astype(np.int32),
            name=os.path.splitext(os.path.basename(path))[0],
        )
        return self.transform(data)

    def __len__(self):
        return len(self.data_list) * self.loop
