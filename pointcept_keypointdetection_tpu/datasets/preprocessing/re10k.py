"""RealEstate10K (RE10K) preprocessing for Concerto-style 2D-3D pretraining.

Reference: `pointcept/datasets/preprocessing/concerto/re10k/preprocess_re10k.py`
— which runs VGGT (a feed-forward reconstruction model) over video frames to
get per-frame depth/pose/intrinsics, fuses a point cloud, RANSAC-aligns the
ground plane to z-up, and writes the Concerto image-point layout
(coord/color/normal + per-frame image/intrinsics/pose/correspondence).

VGGT (and open3d/camtools, which the reference leans on) are external model
weights/libs not present here, so this module implements the SAME data
contract from VGGT-EXPORTED (or any posed-RGBD) per-frame predictions:

    <scene>/frames/<id>.npy        HxWx3 uint8 RGB
    <scene>/depth/<id>.npy         HxW float32 depth (meters)
    <scene>/intrinsic/<id>.npy     3x3 K
    <scene>/pose/<id>.npy          4x4 camera-to-world T

The fusion/correspondence machinery is shared with `concerto.py`
(process_scene_dirs); this module adds the RE10K-specific stages: the
ground-plane RANSAC z-up alignment (fresh numpy implementation of the
percentile-gated iterative-rejection scheme) applied to the fused cloud,
poses and normals.
"""

from __future__ import annotations

import argparse
import glob
import os
from pathlib import Path

import numpy as np


def _fit_plane_ransac(points: np.ndarray, thresh: float, iters: int, rng) -> tuple:
    """(normal, d, inlier_mask) for the best a.x+d=0 plane among sampled triples."""
    n = len(points)
    best = (None, 0.0, None)
    best_count = -1
    for _ in range(iters):
        tri = points[rng.choice(n, 3, replace=False)]
        v1, v2 = tri[1] - tri[0], tri[2] - tri[0]
        nrm = np.cross(v1, v2)
        ln = np.linalg.norm(nrm)
        if ln < 1e-9:
            continue
        nrm = nrm / ln
        d = -np.dot(nrm, tri[0])
        dist = np.abs(points @ nrm + d)
        inl = dist < thresh
        c = int(inl.sum())
        if c > best_count:
            best_count = c
            best = (nrm, d, inl)
    return best


def align_ground_plane(
    points: np.ndarray,
    height_percentile: float = 20.0,
    ransac_distance_threshold: float = 0.01,
    ransac_iterations: int = 1000,
    max_angle_degree: float = 40.0,
    max_trials: int = 6,
    seed: int = 123,
):
    """Find the ground plane among the lowest ``height_percentile`` of points
    and return (R, z_offset) rotating it onto z=0 (up = +z).

    Mirrors the reference's trial loop: a RANSAC plane whose normal deviates
    from vertical by more than ``max_angle_degree`` (a wall) is rejected and
    its inliers removed before retrying.  Raises ValueError when no valid
    ground plane exists (the reference contract).
    """
    rng = np.random.default_rng(seed)
    z = points[:, 2]
    low = np.nonzero(z <= np.percentile(z, height_percentile))[0]
    remaining = low.copy()
    target = np.array([0.0, 0.0, 1.0])
    for _ in range(max_trials):
        if len(remaining) < 3:
            raise ValueError("Not enough points left to fit a ground plane.")
        normal, _d, inl = _fit_plane_ransac(
            points[remaining], ransac_distance_threshold, ransac_iterations, rng
        )
        if normal is None:
            raise ValueError("Degenerate plane samples.")
        if normal[2] < 0:
            normal = -normal
        angle = np.degrees(np.arccos(np.clip(np.dot(normal, target), -1.0, 1.0)))
        if angle <= max_angle_degree:
            inliers_global = remaining[inl]
            axis = np.cross(normal, target)
            ln = np.linalg.norm(axis)
            if ln < 1e-6:
                R = np.eye(3)
            else:
                axis = axis / ln
                th = np.arccos(np.clip(np.dot(normal, target), -1.0, 1.0))
                K = np.array(
                    [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
                )
                R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
            offset = float(np.mean((points[inliers_global] @ R.T)[:, 2]))
            return R.astype(np.float32), offset
        remaining = np.setdiff1d(remaining, remaining[inl])
    raise ValueError("Failed to find a valid ground plane within max trials.")


def _load_depth(scene_dir: str, fid: str):
    npy = os.path.join(scene_dir, "depth", f"{fid}.npy")
    if os.path.exists(npy):
        return np.load(npy).astype(np.float32)
    png = os.path.join(scene_dir, "depth", f"{fid}.png")
    if os.path.exists(png):
        from PIL import Image

        return np.asarray(Image.open(png)).astype(np.float32) / 1000.0
    return None


def fuse_scene(scene_dir: str, grid_size: float = 0.02):
    """Unproject every posed depth frame into one voxel-downsampled world
    cloud with per-pixel normals from depth-map finite differences (the
    reference gets these from VGGT; finite-difference normals on the same
    depth are the model-free equivalent)."""
    K = np.load(os.path.join(scene_dir, "intrinsic", "intrinsic.npy")).astype(np.float64)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    pts, cols, nrms = [], [], []
    from PIL import Image

    for cf in sorted(glob.glob(os.path.join(scene_dir, "color", "*"))):
        fid = os.path.splitext(os.path.basename(cf))[0]
        depth = _load_depth(scene_dir, fid)
        pose_f = os.path.join(scene_dir, "pose", f"{fid}.npy")
        if depth is None or not os.path.exists(pose_f):
            continue
        pose = np.load(pose_f).astype(np.float64).reshape(4, 4)
        color = np.asarray(Image.open(cf).convert("RGB"))
        h, w = depth.shape
        u, v = np.meshgrid(np.arange(w), np.arange(h))
        z = depth
        ok = z > 1e-3
        cam = np.stack([(u - cx) / fx * z, (v - cy) / fy * z, z], -1)  # [h, w, 3]
        world = cam @ pose[:3, :3].T + pose[:3, 3]
        # finite-difference normals in camera space -> world
        dx = np.gradient(cam, axis=1)
        dy = np.gradient(cam, axis=0)
        n = np.cross(dx, dy)
        ln = np.linalg.norm(n, axis=-1, keepdims=True)
        n = np.where(ln > 1e-9, n / np.maximum(ln, 1e-9), 0.0) @ pose[:3, :3].T
        pts.append(world[ok])
        cols.append(color[ok] if color.shape[:2] == depth.shape else np.zeros((ok.sum(), 3), np.uint8))
        nrms.append(n[ok])
    if not pts:
        raise FileNotFoundError(f"no posed depth frames under {scene_dir}")
    coord = np.concatenate(pts).astype(np.float32)
    color = np.concatenate(cols).astype(np.uint8)
    normal = np.concatenate(nrms).astype(np.float32)
    # one point per grid_size voxel
    g = np.floor(coord / grid_size).astype(np.int64)
    g -= g.min(0)
    key = (g[:, 0] * 1_000_003 + g[:, 1]) * 1_000_003 + g[:, 2]
    _, first = np.unique(key, return_index=True)
    sel = np.sort(first)
    return coord[sel], color[sel], normal[sel]


def process_scene(scene_dir: str, output_root: str, grid_size: float = 0.02,
                  max_images: int = 12) -> str:
    """Fuse + z-up align one exported RE10K scene into the Concerto layout
    (coord/color/normal + images.npy/correspondence.npy)."""
    from .concerto import process_scene_dirs

    out = Path(output_root) / Path(scene_dir).name
    out.mkdir(parents=True, exist_ok=True)
    coord, color, normal = fuse_scene(scene_dir, grid_size)
    R, z_off = align_ground_plane(coord)
    coord = coord @ R.T
    coord[:, 2] -= z_off
    np.save(out / "coord.npy", coord.astype(np.float32))
    np.save(out / "color.npy", color)
    np.save(out / "normal.npy", (normal @ R.T).astype(np.float32))
    # image/correspondence assets: the splat-depth occlusion path projects
    # the (aligned) cloud through the ORIGINAL poses, so rotate it back
    # just for projection by passing the original-frame coordinates
    np.save(out / "coord.npy", ((coord + np.asarray([0, 0, z_off])) @ R).astype(np.float32))
    process_scene_dirs(scene_dir, str(out), max_images=max_images)
    np.save(out / "coord.npy", coord.astype(np.float32))
    return str(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", required=True, help="exported RE10K scenes")
    ap.add_argument("--output_root", required=True)
    ap.add_argument("--grid_size", type=float, default=0.02)
    ap.add_argument("--max_images", type=int, default=12)
    args = ap.parse_args()
    scenes = sorted(
        d for d in glob.glob(os.path.join(args.dataset_root, "*")) if os.path.isdir(d)
    )
    for s in scenes:
        print(process_scene(s, args.output_root, args.grid_size, args.max_images))


if __name__ == "__main__":
    main()
