"""Directory-of-.npy dataset readers.

Parity surface: `pointcept/datasets/defaults.py` — ``DefaultDataset`` loads
scene folders of per-asset ``.npy`` files (coord/color/normal/strength/
segment/instance), applies the transform pipeline in train mode, and builds
the TTA fragment pipeline in test mode (aug variants x GridSample(test) parts
x crops).  ``loop`` multiplies the epoch length exactly as the reference does
(`engines/defaults.py:123`).
"""

from __future__ import annotations

import glob
import os
from copy import deepcopy
from typing import Optional, Sequence

import numpy as np

from ..utils.logger import get_root_logger
from .builder import DATASETS
from .transform import TRANSFORMS, Compose

VALID_ASSETS = (
    "coord", "color", "normal", "strength", "segment", "instance", "pose",
    # side point cloud carrying lifted 2D DINO features (DINOEnhancedSegmentor;
    # written by datasets/preprocessing/dino.py)
    "dino_coord", "dino_feat",
)


@DATASETS.register_module()
class DefaultDataset:
    def __init__(
        self,
        split="train",
        data_root="data/dataset",
        transform=None,
        test_mode=False,
        test_cfg=None,
        cache=False,
        loop=1,
        ignore_index=-1,
    ):
        self.data_root = data_root
        self.split = split
        self.cache = cache
        self.transform = Compose(transform)
        self.loop = loop if not test_mode else 1
        self.test_mode = test_mode
        self.test_cfg = test_cfg if test_mode else None
        self.ignore_index = ignore_index

        if test_mode:
            self.test_voxelize = (
                TRANSFORMS.build(self.test_cfg["voxelize"]) if self.test_cfg.get("voxelize") else None
            )
            self.test_crop = TRANSFORMS.build(self.test_cfg["crop"]) if self.test_cfg.get("crop") else None
            self.post_transform = Compose(self.test_cfg.get("post_transform"))
            self.aug_transform = [Compose(aug) for aug in self.test_cfg.get("aug_transform", [[]])]

        self.data_list = self.get_data_list()
        get_root_logger().info(
            "Totally %d x %d samples in %s set.", len(self.data_list), self.loop, split
        )

    def get_data_list(self):
        if isinstance(self.split, str):
            return glob.glob(os.path.join(self.data_root, self.split, "*"))
        data_list = []
        for split in self.split:
            data_list += glob.glob(os.path.join(self.data_root, split, "*"))
        return sorted(data_list)

    def get_data(self, idx):
        data_path = self.data_list[idx % len(self.data_list)]
        if self.cache:
            # /dev/shm shared cache (`datasets/defaults.py:105-116` cache path,
            # pre-populated by the DataCacheOperator hook)
            from ..utils import cache as shm_cache

            cache_name = f"pkt-{data_path.replace(os.path.sep, '-')}"
            if shm_cache.exists(cache_name):
                data_dict = shm_cache.shared_dict(cache_name)
                data_dict["name"] = self.get_data_name(idx)
                return data_dict
            data_dict = self._load_assets(data_path)
            named = dict(data_dict)
            named.pop("name", None)
            shm_cache.shared_dict(cache_name, named)
            data_dict["name"] = self.get_data_name(idx)
            return data_dict
        data_dict = self._load_assets(data_path)
        data_dict["name"] = self.get_data_name(idx)
        return data_dict

    def _load_assets(self, data_path):
        data_dict = {}
        assets = os.listdir(data_path)
        for asset in assets:
            if not asset.endswith(".npy"):
                continue
            name = asset[:-4]
            if name not in VALID_ASSETS:
                continue
            data_dict[name] = np.load(os.path.join(data_path, asset))
        if "coord" in data_dict:
            data_dict["coord"] = data_dict["coord"].astype(np.float32)
        if "color" in data_dict:
            data_dict["color"] = data_dict["color"].astype(np.float32)
        if "normal" in data_dict:
            data_dict["normal"] = data_dict["normal"].astype(np.float32)
        if "segment" in data_dict:
            data_dict["segment"] = data_dict["segment"].reshape(-1).astype(np.int32)
        else:
            data_dict["segment"] = np.ones(data_dict["coord"].shape[0], np.int32) * -1
        if "instance" in data_dict:
            data_dict["instance"] = data_dict["instance"].reshape(-1).astype(np.int32)
        if "dino_coord" in data_dict:
            data_dict["dino_coord"] = data_dict["dino_coord"].astype(np.float32)
        if "dino_feat" in data_dict:
            data_dict["dino_feat"] = data_dict["dino_feat"].astype(np.float32)
        return data_dict

    def get_data_name(self, idx):
        return os.path.basename(self.data_list[idx % len(self.data_list)])

    def prepare_train_data(self, idx):
        return self.transform(self.get_data(idx))

    def prepare_test_data(self, idx):
        """TTA fragment pipeline (`datasets/defaults.py:162-193`)."""
        data_dict = self.get_data(idx)
        data_dict = self.transform(data_dict)
        result_dict = dict(segment=data_dict.pop("segment"), name=data_dict.pop("name"))
        if "origin_segment" in data_dict:
            result_dict["origin_segment"] = data_dict.pop("origin_segment")
        if "inverse" in data_dict:
            result_dict["inverse"] = data_dict.pop("inverse")
        for key in ("dino_coord", "dino_feat"):
            # scene-level side arrays shared by every fragment (DINOSemSegTester)
            if key in data_dict:
                result_dict[key] = data_dict.pop(key)

        data_dict_list = []
        for aug in self.aug_transform:
            data_dict_list.append(aug(deepcopy(data_dict)))

        fragment_list = []
        for data in data_dict_list:
            if self.test_voxelize is not None:
                data_part_list = self.test_voxelize(data)
            else:
                data["index"] = np.arange(data["coord"].shape[0])
                data_part_list = [data]
            for data_part in data_part_list:
                if self.test_crop is not None:
                    data_part = self.test_crop(data_part)
                else:
                    data_part = [data_part]
                fragment_list += data_part
        for i in range(len(fragment_list)):
            fragment_list[i] = self.post_transform(fragment_list[i])
        result_dict["fragment_list"] = fragment_list
        return result_dict

    def __getitem__(self, idx):
        if self.test_mode:
            return self.prepare_test_data(idx)
        return self.prepare_train_data(idx)

    def __len__(self):
        return len(self.data_list) * self.loop


@DATASETS.register_module()
class ConcatDataset:
    """Concatenation of datasets (`datasets/defaults.py:465-502`)."""

    def __init__(self, datasets, loop=1):
        from .builder import build_dataset

        self.datasets = [build_dataset(d) for d in datasets]
        self.loop = loop
        self.data_list = []
        for i, ds in enumerate(self.datasets):
            self.data_list.extend([(i, j) for j in range(len(ds))])

    def __getitem__(self, idx):
        ds_idx, sample_idx = self.data_list[idx % len(self.data_list)]
        return self.datasets[ds_idx][sample_idx]

    def __len__(self):
        return len(self.data_list) * self.loop


@DATASETS.register_module()
class ImagePointDataset(DefaultDataset):
    """Point clouds paired with posed images + point->patch correspondences.

    Parity surface: `pointcept/datasets/defaults.py:206-458`
    ``DefaultImagePointDataset`` — loads per-scene point assets, the scene's
    RGB frames, and per-frame point->pixel correspondences; center-crops each
    frame to a multiple of the ViT patch grid, resizes to
    ``patch_(h,w) * patch_size``, and converts pixel correspondences to patch
    coordinates.

    TPU re-design of the contract: each scene directory holds
    ``images.npy`` ([V, H, W, 3] uint8 or [V, 3, H, W] float) and
    ``correspondence.npy`` ([N, V, 2] int, (x, y) pixel coords or -1) next to
    the usual point assets; the output is padded to ``max_images`` view slots
    (``img_valid`` mask) so batch shapes are static for XLA.
    """

    def __init__(
        self,
        crop_h=630,
        crop_w=1120,
        patch_size=14,
        max_images=8,
        **kwargs,
    ):
        self.crop_h = crop_h
        self.crop_w = crop_w
        self.patch_size = patch_size
        self.patch_h = crop_h // patch_size
        self.patch_w = crop_w // patch_size
        self.max_images = max_images
        super().__init__(**kwargs)

    def get_data(self, idx):
        import scipy.ndimage

        data_dict = super().get_data(idx)
        data_path = self.data_list[idx % len(self.data_list)]
        n = data_dict["coord"].shape[0]
        img_path = os.path.join(data_path, "images.npy")
        corr_path = os.path.join(data_path, "correspondence.npy")
        th, tw = self.patch_h * self.patch_size, self.patch_w * self.patch_size

        images = np.zeros((self.max_images, 3, th, tw), np.float32)
        corr = np.full((n, self.max_images, 2), -1, np.int32)
        img_valid = np.zeros(self.max_images, bool)
        if os.path.exists(img_path):
            raw = np.load(img_path)
            if raw.ndim == 4 and raw.shape[-1] == 3:  # [V, H, W, 3] -> [V, 3, H, W]
                raw = raw.transpose(0, 3, 1, 2)
            if raw.dtype == np.uint8:
                raw = raw.astype(np.float32) / 255.0
            v = min(raw.shape[0], self.max_images)
            _, _, h0, w0 = raw.shape
            # center-crop to the largest multiple of the patch grid
            # (`defaults.py:350-361`)
            div = max(min(w0 // self.patch_w, h0 // self.patch_h), 1)
            ch, cw = div * self.patch_h, div * self.patch_w
            top, left = (h0 - ch) // 2, (w0 - cw) // 2
            cropped = raw[:v, :, top : top + ch, left : left + cw]
            zoom = (1, 1, th / ch, tw / cw)
            images[:v] = scipy.ndimage.zoom(cropped, zoom, order=1)
            img_valid[:v] = True

            if os.path.exists(corr_path):
                raw_corr = np.load(corr_path).astype(np.int64)  # [N, V, 2] (x, y)
                vc = min(raw_corr.shape[1], self.max_images)
                x, y = raw_corr[:, :vc, 0], raw_corr[:, :vc, 1]
                ok = (x >= left) & (x < left + cw) & (y >= top) & (y < top + ch)
                # pixel -> patch coordinates (`defaults.py:278-302`): scale the
                # crop to the target size, then integer-divide by patch_size
                py = ((y - top) * th // ch) // self.patch_size
                px = ((x - left) * tw // cw) // self.patch_size
                corr[:, :vc, 0] = np.where(ok, py, -1).astype(np.int32)
                corr[:, :vc, 1] = np.where(ok, px, -1).astype(np.int32)

        data_dict["images"] = images
        data_dict["img_valid"] = img_valid
        data_dict["correspondence"] = corr
        return data_dict
