"""Lift 2D DINO features onto ScanNet scene point clouds.

Parity surface: `pointcept/datasets/preprocessing/scannet/dino/
preprocess_dino_feature.py` — for every ``frame_skip``-th RGB-D frame the
reference unprojects depth to world coordinates, runs DINOv2 on the
center-cropped color frame, bilinearly upsamples the patch tokens to pixel
resolution, and accumulates (coord, feat) pairs into a ``grid_size`` voxel
grid (mean coord, mean feat).  The output feeds ``DINOEnhancedSegmentor``.

Differences in this rebuild:
- Depth comes from the ``.sens`` sensor stream directly (the reference
  raycasts the clean mesh via camtools; sensor depth avoids that native dep —
  swap ``depth_source`` if mesh-raycast depth is available offline).
- The 2D model is a pluggable ``feat_fn(color_uint8[H,W,3]) -> f32[h,w,C]``;
  ``dinov2_feat_fn()`` builds one from HuggingFace ``transformers`` when
  available (torch CPU is fine — this is offline preprocessing).
- Output is written into the processed scene directory as ``dino_coord.npy``
  / ``dino_feat.npy`` (fp16), the assets ``DefaultDataset`` already loads.
"""

from __future__ import annotations

import argparse
import glob
import os
from typing import Callable, Optional

import numpy as np

from .scannet_pair import SensReader, unproject_depth


def center_crop(image: np.ndarray, crop_ratio: float, patch_size: int) -> np.ndarray:
    """Crop to the centered largest patch-multiple window (`preprocess_dino_feature.py:162-183`)."""
    h, w = image.shape[:2]
    ch = int(h * crop_ratio) // patch_size * patch_size
    cw = int(w * crop_ratio) // patch_size * patch_size
    top, left = (h - ch) // 2, (w - cw) // 2
    return image[top : top + ch, left : left + cw]


def bilinear_upsample(feat: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """[h, w, C] -> [out_h, out_w, C] bilinear (align_corners=False)."""
    h, w, _ = feat.shape
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    top = feat[y0][:, x0] * (1 - wx) + feat[y0][:, x1] * wx
    bot = feat[y1][:, x0] * (1 - wx) + feat[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


class GridAccumulator:
    """Streaming voxel-grid mean of (coord, feat) across frames — the numpy
    equivalent of the reference's repeated torch_scatter re-pooling
    (`preprocess_dino_feature.py:258-276`)."""

    def __init__(self, grid_size: float):
        self.grid_size = grid_size
        self.keys: Optional[np.ndarray] = None
        self.coord_sum: Optional[np.ndarray] = None
        self.feat_sum: Optional[np.ndarray] = None
        self.count: Optional[np.ndarray] = None

    def add(self, coord: np.ndarray, feat: np.ndarray):
        # carry true per-voxel SUMS and COUNTS across frames; the mean is
        # taken once in result(), so every observation weighs equally no
        # matter which frame it arrived in
        grid = np.floor(coord / self.grid_size).astype(np.int64)
        key = (grid[:, 0] << 42) ^ (grid[:, 1] << 21) ^ grid[:, 2]
        keys = key if self.keys is None else np.concatenate([self.keys, key])
        coords = (
            coord.astype(np.float64)
            if self.coord_sum is None
            else np.concatenate([self.coord_sum, coord])
        )
        feats = (
            feat.astype(np.float64)
            if self.feat_sum is None
            else np.concatenate([self.feat_sum, feat])
        )
        counts = (
            np.ones(len(coord))
            if self.count is None
            else np.concatenate([self.count, np.ones(len(coord))])
        )
        uniq, inv = np.unique(keys, return_inverse=True)
        self.keys = uniq
        self.coord_sum = np.zeros((len(uniq), 3), np.float64)
        np.add.at(self.coord_sum, inv, coords)
        self.feat_sum = np.zeros((len(uniq), feat.shape[1]), np.float64)
        np.add.at(self.feat_sum, inv, feats)
        self.count = np.zeros(len(uniq))
        np.add.at(self.count, inv, counts)

    def result(self):
        count = np.maximum(self.count, 1.0)[:, None]
        return (
            (self.coord_sum / count).astype(np.float16),
            (self.feat_sum / count).astype(np.float16),
        )


def dinov2_feat_fn(model_name: str = "facebook/dinov2-small") -> Callable:
    """Build a patch-feature function from HuggingFace transformers (torch CPU)."""
    import torch
    from transformers import AutoImageProcessor, AutoModel

    processor = AutoImageProcessor.from_pretrained(model_name)
    model = AutoModel.from_pretrained(model_name).eval()
    patch = model.config.patch_size

    def feat_fn(color: np.ndarray) -> np.ndarray:
        h, w = color.shape[:2]
        inputs = processor(
            images=color, return_tensors="pt", do_resize=False, do_center_crop=False
        )
        with torch.inference_mode():
            tokens = model(**inputs).last_hidden_state[0, 1:]  # drop CLS
        return tokens.reshape(h // patch, w // patch, -1).float().numpy()

    feat_fn.patch_size = patch
    return feat_fn


def lift_scene(
    sens_path: str,
    feat_fn: Callable,
    frame_skip: int = 20,
    grid_size: float = 0.08,
    crop_ratio: float = 0.95,
    patch_size: int = 14,
    max_frames: Optional[int] = None,
):
    """Returns (dino_coord fp16 [M, 3], dino_feat fp16 [M, C]) for one scene."""
    patch_size = getattr(feat_fn, "patch_size", patch_size)
    reader = SensReader(sens_path)
    acc = GridAccumulator(grid_size)
    try:
        for i, frame in enumerate(reader.frames(frame_skip=frame_skip, load_color=True)):
            if max_frames is not None and i >= max_frames:
                break
            if not np.isfinite(frame.pose).all():
                continue
            from PIL import Image

            dh, dw = frame.depth.shape
            color = np.asarray(Image.fromarray(frame.color).resize((dw, dh)))
            depth = center_crop(frame.depth, crop_ratio, patch_size)
            color = center_crop(color, crop_ratio, patch_size)
            # intrinsics shift by the crop offset
            top = (dh - depth.shape[0]) // 2
            left = (dw - depth.shape[1]) // 2
            intrinsic = reader.intrinsic_depth.copy()
            intrinsic[0, 2] -= left
            intrinsic[1, 2] -= top
            coord, valid = unproject_depth(depth, intrinsic, frame.pose, reader.depth_shift)
            if coord.shape[0] == 0:
                continue
            patch_feat = feat_fn(color)  # [h/p, w/p, C]
            pix_feat = bilinear_upsample(patch_feat, depth.shape[0], depth.shape[1])
            acc.add(coord, pix_feat.reshape(-1, pix_feat.shape[-1])[valid.reshape(-1)])
    finally:
        reader.close()
    return acc.result()


def prepare_scene_list(dataset_root: str, output_path: str, folder: str = "scans"):
    """Write the scene-name list (`dino/prepare_scene_list.py` parity)."""
    scenes = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(dataset_root, folder, "scene*"))
    )
    with open(output_path, "w") as f:
        f.write("\n".join(scenes) + "\n")
    return scenes


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset_root", required=True, help="raw ScanNet root (scans/scene*)")
    parser.add_argument(
        "--processed_root", required=True, help="processed scene dirs to write dino_*.npy into"
    )
    parser.add_argument("--split", default="train")
    parser.add_argument("--model", default="facebook/dinov2-small")
    parser.add_argument("--frame_skip", type=int, default=20)
    parser.add_argument("--grid_size", type=float, default=0.08)
    parser.add_argument("--crop_ratio", type=float, default=0.95)
    args = parser.parse_args()

    feat_fn = dinov2_feat_fn(args.model)
    folder = "scans_test" if args.split == "test" else "scans"
    for scene_dir in sorted(glob.glob(os.path.join(args.processed_root, args.split, "scene*"))):
        name = os.path.basename(scene_dir)
        sens = os.path.join(args.dataset_root, folder, name, f"{name}.sens")
        if not os.path.isfile(sens):
            print(f"skip {name}: no .sens")
            continue
        coord, feat = lift_scene(
            sens,
            feat_fn,
            frame_skip=args.frame_skip,
            grid_size=args.grid_size,
            crop_ratio=args.crop_ratio,
        )
        np.save(os.path.join(scene_dir, "dino_coord.npy"), coord)
        np.save(os.path.join(scene_dir, "dino_feat.npy"), feat)
        print(f"{name}: {coord.shape[0]} dino points")


if __name__ == "__main__":
    main()
