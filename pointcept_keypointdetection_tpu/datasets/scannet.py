"""ScanNet / ScanNet200 / S3DIS scene datasets.

Parity surface: `pointcept/datasets/scannet.py` (ScanNetDataset with 20/200
class splits, sampled-index data-efficient splits) and `s3dis.py` — both are
directory-of-.npy readers over the preprocessing outputs, so they specialize
``DefaultDataset`` with class metadata and label remapping.
"""

from __future__ import annotations

import os

import numpy as np

from .builder import DATASETS
from .defaults import DefaultDataset

SCANNET_20_CLASSES = (
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door", "window",
    "bookshelf", "picture", "counter", "desk", "curtain", "refrigerator",
    "shower curtain", "toilet", "sink", "bathtub", "otherfurniture",
)

S3DIS_CLASSES = (
    "ceiling", "floor", "wall", "beam", "column", "window", "door", "table",
    "chair", "sofa", "bookcase", "board", "clutter",
)


@DATASETS.register_module()
class ScanNetDataset(DefaultDataset):
    class_names = SCANNET_20_CLASSES

    def __init__(self, lr_file=None, la_file=None, **kwargs):
        self.lr = np.loadtxt(lr_file, dtype=str) if lr_file is not None else None
        self.la = np.load(la_file, allow_pickle=True).item() if la_file is not None else None
        super().__init__(**kwargs)

    def get_data_list(self):
        if self.lr is None:
            return super().get_data_list()
        return [os.path.join(self.data_root, "train", name) for name in self.lr]

    def get_data(self, idx):
        data_dict = super().get_data(idx)
        seg20 = os.path.join(self.data_list[idx % len(self.data_list)], "segment20.npy")
        if os.path.exists(seg20):
            data_dict["segment"] = np.load(seg20).reshape(-1).astype(np.int32)
        if self.la:
            sampled_index = self.la[self.get_data_name(idx)]
            mask = np.ones_like(data_dict["segment"], bool)
            mask[sampled_index] = False
            data_dict["segment"][mask] = self.ignore_index
            data_dict["sampled_index"] = sampled_index
        return data_dict


# the ScanNet200 benchmark's 200 class labels (public dataset constants,
# reference `preprocessing/scannet/meta_data/scannet200_constants.py`)
SCANNET_200_CLASSES = (
    "wall", "chair", "floor", "table", "door", "couch", "cabinet", "shelf", "desk",
    "office chair", "bed", "pillow", "sink", "picture", "window", "toilet", "bookshelf",
    "monitor", "curtain", "book", "armchair", "coffee table", "box", "refrigerator", "lamp",
    "kitchen cabinet", "towel", "clothes", "tv", "nightstand", "counter", "dresser", "stool",
    "cushion", "plant", "ceiling", "bathtub", "end table", "dining table", "keyboard", "bag",
    "backpack", "toilet paper", "printer", "tv stand", "whiteboard", "blanket",
    "shower curtain", "trash can", "closet", "stairs", "microwave", "stove", "shoe",
    "computer tower", "bottle", "bin", "ottoman", "bench", "board", "washing machine",
    "mirror", "copier", "basket", "sofa chair", "file cabinet", "fan", "laptop", "shower",
    "paper", "person", "paper towel dispenser", "oven", "blinds", "rack", "plate",
    "blackboard", "piano", "suitcase", "rail", "radiator", "recycling bin", "container",
    "wardrobe", "soap dispenser", "telephone", "bucket", "clock", "stand", "light",
    "laundry basket", "pipe", "clothes dryer", "guitar", "toilet paper holder", "seat",
    "speaker", "column", "bicycle", "ladder", "bathroom stall", "shower wall", "cup", "jacket",
    "storage bin", "coffee maker", "dishwasher", "paper towel roll", "machine", "mat",
    "windowsill", "bar", "toaster", "bulletin board", "ironing board", "fireplace",
    "soap dish", "kitchen counter", "doorframe", "toilet paper dispenser", "mini fridge",
    "fire extinguisher", "ball", "hat", "shower curtain rod", "water cooler", "paper cutter",
    "tray", "shower door", "pillar", "ledge", "toaster oven", "mouse",
    "toilet seat cover dispenser", "furniture", "cart", "storage container", "scale",
    "tissue box", "light switch", "crate", "power outlet", "decoration", "sign", "projector",
    "closet door", "vacuum cleaner", "candle", "plunger", "stuffed animal", "headphones",
    "dish rack", "broom", "guitar case", "range hood", "dustpan", "hair dryer", "water bottle",
    "handicap bar", "purse", "vent", "shower floor", "water pitcher", "mailbox", "bowl",
    "paper bag", "alarm clock", "music stand", "projector screen", "divider",
    "laundry detergent", "bathroom counter", "object", "bathroom vanity", "closet wall",
    "laundry hamper", "bathroom stall door", "ceiling light", "trash bin", "dumbbell",
    "stair rail", "tube", "bathroom cabinet", "cd case", "closet rod", "coffee kettle",
    "structure", "shower head", "keyboard piano", "case of water bottles", "coat rack",
    "storage organizer", "folded chair", "fire alarm", "power strip", "calendar", "poster",
    "potted plant", "luggage", "mattress",
)


@DATASETS.register_module()
class ScanNet200Dataset(ScanNetDataset):
    class_names = SCANNET_200_CLASSES

    def get_data(self, idx):
        data_dict = DefaultDataset.get_data(self, idx)
        path = self.data_list[idx % len(self.data_list)]
        seg_file = os.path.join(path, "segment200.npy")
        if os.path.exists(seg_file):
            data_dict["segment"] = np.load(seg_file).reshape(-1).astype(np.int32)
        return data_dict


@DATASETS.register_module()
class S3DISDataset(DefaultDataset):
    class_names = S3DIS_CLASSES


@DATASETS.register_module()
class ScanNetPPDataset(DefaultDataset):
    """ScanNet++ (parity: `pointcept/datasets/scannetpp.py`): top-3 logit
    submission handled by SemSegTester via save_submit."""

    class_names = tuple(f"class{i}" for i in range(100))


@DATASETS.register_module()
class Structured3DDataset(DefaultDataset):
    """Structured3D panoramic scenes (parity: `pointcept/datasets/structured3d.py`)."""

    class_names = SCANNET_20_CLASSES

    def get_data_list(self):
        import glob as _glob

        if isinstance(self.split, str):
            return sorted(_glob.glob(os.path.join(self.data_root, self.split, "scene_*", "room_*")))
        out = []
        for split in self.split:
            out += _glob.glob(os.path.join(self.data_root, split, "scene_*", "room_*"))
        return sorted(out)

    def get_data_name(self, idx):
        path = self.data_list[idx % len(self.data_list)]
        return f"{os.path.basename(os.path.dirname(path))}_{os.path.basename(path)}"


@DATASETS.register_module()
class Matterport3DDataset(DefaultDataset):
    """Matterport3D regions (parity: `pointcept/datasets/matterport3d.py`)."""

    class_names = SCANNET_20_CLASSES


@DATASETS.register_module()
class HM3DDataset(DefaultDataset):
    """Habitat-Matterport 3D (parity: `pointcept/datasets/hm3d.py`) — SSL corpus."""


@DATASETS.register_module()
class AEODataset(DefaultDataset):
    """AEO egocentric dataset (parity: `pointcept/datasets/aeo.py:17-30`):
    remaps the 41 raw NYU-style labels onto 16 learning classes, all others
    to ignore."""

    class_names = tuple(f"class{i}" for i in range(16))

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        label_mapping = np.full(41, -1, np.int32)
        label_mapping[[0, 1, 3, 4, 13, 16, 19, 21, 22, 28, 29, 34, 36, 37, 38, 39]] = (
            np.arange(16, dtype=np.int32)
        )
        self.label_mapping = label_mapping

    def get_data(self, idx):
        data_dict = super().get_data(idx)
        seg = data_dict["segment"]
        data_dict["segment"] = np.where(
            (seg >= 0) & (seg < len(self.label_mapping)), self.label_mapping[np.clip(seg, 0, 40)], -1
        ).astype(np.int32)
        return data_dict
