"""Concerto image-point asset preprocessing.

Parity surface: `pointcept/datasets/preprocessing/concerto/*/preprocess_*.py`
(e.g. `concerto/scannet/preprocess_scannet.py:305-495`) — for every scene the
reference exports posed RGB frames, camera intrinsics, and a per-frame
``correspondence/<frame>.npy`` table mapping visible pixels to point-cloud
indices, computed by raycasting the scene mesh to a depth image (camtools) and
kd-tree matching backprojected pixels to the point cloud
(`preprocess_scannet.py:520-552,337-371`).

TPU-native redesign: instead of mesh raycasting + kd-tree (o3d/camtools are
not available, and per-pixel tables are awkward to batch), visibility is
resolved by **projecting the points themselves** into each posed camera and
z-testing against the sensor depth image (or a point-splatted depth buffer
when no sensor depth exists).  The output is the static-shape contract
``ImagePointDataset`` consumes (`datasets/defaults.py:198-277`):

* ``images.npy``          uint8 [V, H, W, 3] — selected RGB frames
* ``correspondence.npy``  int32 [N, V, 2] — per-point (x, y) pixel coords in
  each view, -1 where the point is not visible

written next to the scene's point assets (``coord.npy`` etc.).  Two input
layouts are supported: a ScanNet ``.sens`` container (parsed by the streaming
reader in ``scannet_pair.py``) or the generic exported-directory layout
(``color/ depth/ pose/ intrinsic/intrinsic.npy``) that the reference's own
exporter produces for every dataset family (scannet/scannetpp/arkitscenes/...).
"""

from __future__ import annotations

import argparse
import glob
import math
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from .scannet_pair import SensReader


def project_points(
    coord: np.ndarray,
    intrinsic: np.ndarray,
    pose: np.ndarray,
    img_hw: Tuple[int, int],
    depth: Optional[np.ndarray] = None,
    depth_shift: float = 1000.0,
    depth_tol: float = 0.05,
) -> np.ndarray:
    """Project world points into one posed camera.

    Returns int32 [N, 2] of (x, y) pixel coordinates, -1 where the point is
    behind the camera, out of frame, or fails the depth-buffer visibility test
    (occluded).  ``pose`` is camera-to-world; a non-finite pose yields all -1
    (the reference writes a ``-ones`` table for such frames,
    `preprocess_scannet.py:360-363`).
    """
    n = coord.shape[0]
    out = np.full((n, 2), -1, np.int32)
    if not np.isfinite(pose).all():
        return out
    h, w = img_hw
    world2cam = np.linalg.inv(pose)
    cam = coord @ world2cam[:3, :3].T + world2cam[:3, 3]
    z = cam[:, 2]
    ok = z > 1e-4
    zs = np.where(ok, z, 1.0)
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    u = np.rint(cam[:, 0] / zs * fx + cx).astype(np.int64)
    v = np.rint(cam[:, 1] / zs * fy + cy).astype(np.int64)
    ok &= (u >= 0) & (u < w) & (v >= 0) & (v < h)

    if depth is not None:
        dh, dw = depth.shape
        # sensor depth may be lower-resolution than color; rescale indices
        du = np.clip((u * dw) // w, 0, dw - 1)
        dv = np.clip((v * dh) // h, 0, dh - 1)
        dbuf = depth[np.where(ok, dv, 0), np.where(ok, du, 0)].astype(np.float32)
        dbuf = dbuf / depth_shift
        tol = np.maximum(depth_tol, depth_tol * dbuf)
        ok &= (dbuf > 0) & (np.abs(z - dbuf) <= tol)

    out[ok, 0] = u[ok]
    out[ok, 1] = v[ok]
    return out


def splat_depth_buffer(
    coord: np.ndarray,
    intrinsic: np.ndarray,
    pose: np.ndarray,
    img_hw: Tuple[int, int],
    downscale: int = 4,
) -> np.ndarray:
    """Point-splatted min-z depth buffer (fallback when no sensor depth).

    Splats every point's camera depth into a ``downscale``-coarse grid keeping
    the per-cell minimum — the same occlusion signal the reference gets from
    mesh raycasting, at point (not mesh) resolution.  Returns float32
    [H/downscale, W/downscale] with 0 = empty.
    """
    h, w = img_hw
    gh, gw = max(h // downscale, 1), max(w // downscale, 1)
    if not np.isfinite(pose).all():
        return np.zeros((gh, gw), np.float32)
    world2cam = np.linalg.inv(pose)
    cam = coord @ world2cam[:3, :3].T + world2cam[:3, 3]
    z = cam[:, 2]
    ok = z > 1e-4
    zs = np.where(ok, z, 1.0)
    u = (cam[:, 0] / zs * intrinsic[0, 0] + intrinsic[0, 2]) * gw / w
    v = (cam[:, 1] / zs * intrinsic[1, 1] + intrinsic[1, 2]) * gh / h
    ui = u.astype(np.int64)
    vi = v.astype(np.int64)
    ok &= (ui >= 0) & (ui < gw) & (vi >= 0) & (vi < gh)
    buf = np.full(gh * gw, np.inf, np.float32)
    np.minimum.at(buf, vi[ok] * gw + ui[ok], z[ok].astype(np.float32))
    buf[~np.isfinite(buf)] = 0.0
    return buf.reshape(gh, gw)


def select_views(counts: Sequence[int], max_images: int) -> np.ndarray:
    """Pick up to ``max_images`` views, preferring high correspondence counts
    while preserving temporal order (stable view slots for the dataset)."""
    counts = np.asarray(counts)
    if counts.size <= max_images:
        return np.arange(counts.size)
    top = np.argsort(-counts, kind="stable")[:max_images]
    return np.sort(top)


def _finalize_scene(
    asset_dir: str,
    coord: np.ndarray,
    colors: Sequence[np.ndarray],
    corrs: Sequence[np.ndarray],
    max_images: int,
) -> int:
    """Rank views, stack, and write ``images.npy`` / ``correspondence.npy``."""
    os.makedirs(asset_dir, exist_ok=True)
    n = coord.shape[0]
    if len(colors) == 0:
        np.save(os.path.join(asset_dir, "images.npy"), np.zeros((0, 1, 1, 3), np.uint8))
        np.save(
            os.path.join(asset_dir, "correspondence.npy"),
            np.full((n, 0, 2), -1, np.int32),
        )
        return 0
    counts = [int((c[:, 0] >= 0).sum()) for c in corrs]
    keep = select_views(counts, max_images)
    images = np.stack([colors[i] for i in keep]).astype(np.uint8)
    corr = np.stack([corrs[i] for i in keep], axis=1).astype(np.int32)  # [N, V, 2]
    np.save(os.path.join(asset_dir, "images.npy"), images)
    np.save(os.path.join(asset_dir, "correspondence.npy"), corr)
    return len(keep)


def quat_to_rotmat(qw: float, qx: float, qy: float, qz: float) -> np.ndarray:
    """Unit-quaternion (w, x, y, z) -> 3x3 rotation matrix."""
    n = math.sqrt(qw * qw + qx * qx + qy * qy + qz * qz)
    qw, qx, qy, qz = qw / n, qx / n, qy / n, qz / n
    return np.array(
        [
            [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw)],
            [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qx * qw)],
            [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw), 1 - 2 * (qx * qx + qy * qy)],
        ],
        np.float64,
    )


def axis_angle_to_rotmat(r: np.ndarray) -> np.ndarray:
    """Rodrigues: axis-angle vector [3] -> 3x3 rotation matrix."""
    theta = float(np.linalg.norm(r))
    if theta < 1e-12:
        return np.eye(3)
    k = np.asarray(r, np.float64) / theta
    K = np.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]], np.float64
    )
    return np.eye(3) + math.sin(theta) * K + (1 - math.cos(theta)) * (K @ K)


def load_colmap_model(sfm_dir: str):
    """Parse a COLMAP TEXT model -> {image_name: (intrinsic 3x3, c2w 4x4)}.

    The ScanNet++ DSLR layout (reference
    `concerto/scannetpp/preprocess_scannetpp.py:40-120`): ``images.txt`` rows
    are ``IMAGE_ID QW QX QY QZ TX TY TZ CAMERA_ID NAME`` in WORLD->CAMERA
    convention (inverted here to camera-to-world); ``cameras.txt`` rows are
    ``CAMERA_ID MODEL W H <params>`` with params fx fy cx cy for PINHOLE /
    OPENCV (distortion coefficients ignored — feed undistorted frames, as the
    reference does) and f cx cy for SIMPLE_PINHOLE / SIMPLE_RADIAL.
    """
    cams = {}
    with open(os.path.join(sfm_dir, "cameras.txt")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            cam_id, model = parts[0], parts[1]
            p = [float(x) for x in parts[4:]]
            if model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL"):
                fx = fy = p[0]
                cx, cy = p[1], p[2]
            else:  # PINHOLE, OPENCV, OPENCV_FISHEYE, ...
                fx, fy, cx, cy = p[0], p[1], p[2], p[3]
            cams[cam_id] = np.array(
                [[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64
            )
    frames = {}
    with open(os.path.join(sfm_dir, "images.txt")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) < 10:
                continue  # short POINTS2D rows / malformed
            # images.txt alternates IMAGE rows with POINTS2D rows (X Y ID
            # triplets, all numeric).  An image row's 10th field is the file
            # NAME — the one field that does not parse as a number; a points
            # row's parts[9] is a pixel coordinate and does
            try:
                float(parts[9])
                continue  # POINTS2D row
            except ValueError:
                pass  # image row
            qw, qx, qy, qz = (float(x) for x in parts[1:5])
            t = np.array([float(x) for x in parts[5:8]], np.float64)
            cam_id, name = parts[8], parts[9]
            w2c = np.eye(4)
            w2c[:3, :3] = quat_to_rotmat(qw, qx, qy, qz)
            w2c[:3, 3] = t
            frames[name] = (cams[cam_id], np.linalg.inv(w2c))
    return frames


class ArkitTraj:
    """ARKitScenes ``lowres_wide.traj``: camera-to-world poses queryable by
    NEAREST timestamp (frame filenames and .traj rows are systematically off
    by ~1 ms in some captures, so exact-string matching silently drops
    frames — the reference's own loader matches with tolerance)."""

    def __init__(self, ts: np.ndarray, poses: np.ndarray):
        order = np.argsort(ts)
        self.ts = ts[order]
        self.poses = poses[order]

    def nearest(self, t: float, tol: float = 0.011):
        """c2w 4x4 of the trajectory row nearest ``t``, or None beyond tol."""
        if len(self.ts) == 0:
            return None
        i = int(np.searchsorted(self.ts, t))
        best, best_dt = None, tol
        for j in (i - 1, i):
            if 0 <= j < len(self.ts) and abs(self.ts[j] - t) <= best_dt:
                best, best_dt = j, abs(self.ts[j] - t)
        return None if best is None else self.poses[best]


def load_arkit_traj(traj_path: str) -> ArkitTraj:
    """Parse ``lowres_wide.traj``: rows ``ts rx ry rz tx ty tz`` with
    axis-angle rotation, WORLD->CAMERA (reference
    `concerto/arkitscenes/preprocess_arkitscenes.py:112-130` inverts the
    same way); returns an ``ArkitTraj`` for nearest-timestamp lookup."""
    ts_list, poses = [], []
    with open(traj_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 7:
                continue
            w2c = np.eye(4)
            w2c[:3, :3] = axis_angle_to_rotmat(np.array([float(x) for x in parts[1:4]]))
            w2c[:3, 3] = [float(x) for x in parts[4:7]]
            ts_list.append(float(parts[0]))
            poses.append(np.linalg.inv(w2c))
    return ArkitTraj(
        np.asarray(ts_list, np.float64),
        np.stack(poses) if poses else np.zeros((0, 4, 4)),
    )


def load_pincam(path: str) -> np.ndarray:
    """ARKit ``.pincam`` intrinsics file: ``w h fx fy cx cy`` -> 3x3."""
    w, h, fx, fy, cx, cy = [float(x) for x in open(path).read().split()]
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)


def process_scene_frames(
    asset_dir: str,
    frames,
    max_images: int = 8,
    depth_tol: float = 0.05,
    splat_downscale: int = 4,
) -> int:
    """Generic scene export: ``frames`` yields (color ndarray [H,W,3],
    intrinsic 3x3, c2w pose 4x4, depth ndarray|None, depth_shift).  Without a
    sensor depth, occlusion uses the point-splatted buffer.  Used by the
    COLMAP (ScanNet++) and ARKit adapters."""
    coord = np.load(os.path.join(asset_dir, "coord.npy")).astype(np.float64)
    colors, corrs = [], []
    for color, intrinsic, pose, depth, shift in frames:
        h, w = color.shape[:2]
        if depth is None:
            depth = splat_depth_buffer(
                coord, intrinsic, pose, (h, w), downscale=splat_downscale
            )
            shift = 1.0
        corr = project_points(
            coord, intrinsic, pose, (h, w),
            depth=depth, depth_shift=shift, depth_tol=depth_tol,
        )
        colors.append(np.asarray(color))
        corrs.append(corr)
    return _finalize_scene(asset_dir, coord, colors, corrs, max_images)


def process_scene_colmap(
    scene_dir: str,
    asset_dir: str,
    frame_gap: int = 5,
    max_images: int = 8,
    depth_tol: float = 0.05,
    sfm_subdir: str = "colmap",
    image_subdir: str = "undistorted_images",
) -> int:
    """ScanNet++-style COLMAP scene (``<scene>/colmap/{cameras,images}.txt`` +
    undistorted frames) -> image/correspondence assets."""
    from PIL import Image

    model = load_colmap_model(os.path.join(scene_dir, sfm_subdir))
    names = sorted(model)[::frame_gap]

    def gen():
        for name in names:
            img_path = os.path.join(scene_dir, image_subdir, name)
            if not os.path.exists(img_path):
                continue
            intrinsic, pose = model[name]
            yield np.asarray(Image.open(img_path).convert("RGB")), intrinsic, pose, None, 1.0

    return process_scene_frames(asset_dir, gen(), max_images, depth_tol)


def process_scene_arkit(
    scene_dir: str,
    asset_dir: str,
    frame_gap: int = 10,
    max_images: int = 8,
    depth_tol: float = 0.05,
) -> int:
    """ARKitScenes scene (``lowres_wide/`` frames, ``lowres_wide_intrinsics/``
    .pincam files, ``lowres_wide.traj``) -> image/correspondence assets.
    Depth frames in ``lowres_depth/`` (mm PNGs) are used when present."""
    from PIL import Image

    traj = load_arkit_traj(os.path.join(scene_dir, "lowres_wide.traj"))
    frames = sorted(glob.glob(os.path.join(scene_dir, "lowres_wide", "*.png")))[::frame_gap]

    def gen():
        for fp in frames:
            stem = os.path.splitext(os.path.basename(fp))[0]
            pose = traj.nearest(float(stem.split("_")[-1]))
            if pose is None:
                continue
            pincam = os.path.join(scene_dir, "lowres_wide_intrinsics", stem + ".pincam")
            if not os.path.exists(pincam):
                continue
            depth_path = os.path.join(scene_dir, "lowres_depth", os.path.basename(fp))
            depth = (
                np.asarray(Image.open(depth_path)).astype(np.float32)
                if os.path.exists(depth_path)
                else None
            )
            yield (
                np.asarray(Image.open(fp).convert("RGB")),
                load_pincam(pincam),
                pose,
                depth,
                1000.0,
            )

    return process_scene_frames(asset_dir, gen(), max_images, depth_tol)


def process_scene_sens(
    sens_path: str,
    asset_dir: str,
    frame_gap: int = 75,
    max_images: int = 8,
    depth_tol: float = 0.05,
    max_frames: Optional[int] = None,
) -> int:
    """ScanNet ``.sens`` scene -> image/correspondence assets.

    ``asset_dir`` must already contain the scene's ``coord.npy`` (produced by
    the point preprocessing, `preprocessing/scannet.py`); mirrors the
    reference's two-stage flow (`preprocess_scannet.py:414-447,469-495`).
    """
    coord = np.load(os.path.join(asset_dir, "coord.npy")).astype(np.float64)
    reader = SensReader(sens_path)
    colors, corrs = [], []
    try:
        k_color = reader.intrinsic_color.astype(np.float64)
        k_depth = reader.intrinsic_depth.astype(np.float64)
        for i, frame in enumerate(reader.frames(frame_skip=frame_gap, load_color=True)):
            if max_frames is not None and i >= max_frames:
                break
            if frame.color is None:
                continue
            h, w = frame.color.shape[:2]
            # z-test in depth-camera geometry, pixel coords in color geometry
            corr_d = project_points(
                coord,
                k_depth,
                frame.pose.astype(np.float64),
                frame.depth.shape,
                depth=frame.depth,
                depth_shift=reader.depth_shift,
                depth_tol=depth_tol,
            )
            corr = project_points(
                coord, k_color, frame.pose.astype(np.float64), (h, w)
            )
            corr[corr_d[:, 0] < 0] = -1
            colors.append(frame.color)
            corrs.append(corr)
    finally:
        reader.close()
    return _finalize_scene(asset_dir, coord, colors, corrs, max_images)


def process_scene_dirs(
    scene_dir: str,
    asset_dir: str,
    frame_gap: int = 1,
    max_images: int = 8,
    depth_tol: float = 0.05,
    depth_shift: float = 1000.0,
    splat_downscale: int = 4,
) -> int:
    """Exported-directory scene (``color/ depth/ pose/ intrinsic/``) ->
    image/correspondence assets.

    ``depth/`` is optional: without it, occlusion falls back to a
    point-splatted depth buffer (`splat_depth_buffer`).  Pose files are
    ``<frame>.npy`` ([4,4] camera-to-world) or whitespace ``.txt``.
    """
    from PIL import Image

    coord = np.load(os.path.join(asset_dir, "coord.npy")).astype(np.float64)
    intrinsic = np.load(os.path.join(scene_dir, "intrinsic", "intrinsic.npy"))
    intrinsic = np.asarray(intrinsic, np.float64)

    def frame_key(path):
        # numeric frame ids sort temporally; exporters that prefix names
        # (frame_000042.jpg, timestamps) fall back to the digit run, then to
        # the raw name so mixed layouts never crash
        stem = os.path.splitext(os.path.basename(path))[0]
        digits = "".join(ch for ch in stem if ch.isdigit())
        return (int(digits) if digits else 0, stem)

    color_files = sorted(
        glob.glob(os.path.join(scene_dir, "color", "*")), key=frame_key
    )[::frame_gap]
    colors, corrs = [], []
    for cf in color_files:
        fid = os.path.splitext(os.path.basename(cf))[0]
        pose_npy = os.path.join(scene_dir, "pose", f"{fid}.npy")
        pose_txt = os.path.join(scene_dir, "pose", f"{fid}.txt")
        if os.path.exists(pose_npy):
            pose = np.load(pose_npy)
        elif os.path.exists(pose_txt):
            pose = np.loadtxt(pose_txt)
        else:
            continue
        pose = np.asarray(pose, np.float64).reshape(4, 4)
        color = np.asarray(Image.open(cf).convert("RGB"))
        h, w = color.shape[:2]

        depth_path = os.path.join(scene_dir, "depth", f"{fid}.png")
        if os.path.exists(depth_path):
            depth = np.asarray(Image.open(depth_path)).astype(np.float32)
            shift = depth_shift
        else:
            depth = splat_depth_buffer(
                coord, intrinsic, pose, (h, w), downscale=splat_downscale
            )
            shift = 1.0
        corr = project_points(
            coord,
            intrinsic,
            pose,
            (h, w),
            depth=depth,
            depth_shift=shift,
            depth_tol=depth_tol,
        )
        colors.append(color)
        corrs.append(corr)
    return _finalize_scene(asset_dir, coord, colors, corrs, max_images)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--dataset_root",
        required=True,
        help="root of raw scenes: scans*/scene*/*.sens (ScanNet) or "
        "<scene>/{color,depth,pose,intrinsic} exported dirs",
    )
    parser.add_argument(
        "--assets_root",
        required=True,
        help="root of preprocessed point assets (<split>/<scene>/coord.npy); "
        "images.npy/correspondence.npy are written beside them",
    )
    parser.add_argument(
        "--frame_gap", type=int, default=None,
        help="frame subsampling stride; default per layout: 75 (.sens 30fps "
        "streams), 1 (exported dirs), 5 (COLMAP), 10 (ARKit)",
    )
    parser.add_argument("--max_images", type=int, default=8)
    parser.add_argument("--depth_tol", type=float, default=0.05)
    parser.add_argument("--sfm_subdir", default="colmap", help="COLMAP text-model subdir (ScanNet++ scenes)")
    parser.add_argument("--image_subdir", default="undistorted_images", help="frame subdir for COLMAP scenes")
    args = parser.parse_args()

    asset_dirs = {
        os.path.basename(d): d
        for d in glob.glob(os.path.join(args.assets_root, "*", "*"))
        if os.path.exists(os.path.join(d, "coord.npy"))
    }
    done = 0
    for sens_path in sorted(
        glob.glob(os.path.join(args.dataset_root, "scans*", "*", "*.sens"))
    ):
        scene_id = os.path.basename(os.path.dirname(sens_path))
        if scene_id not in asset_dirs:
            continue
        v = process_scene_sens(
            sens_path,
            asset_dirs[scene_id],
            frame_gap=args.frame_gap if args.frame_gap is not None else 75,
            max_images=args.max_images,
            depth_tol=args.depth_tol,
        )
        print(f"{scene_id}: {v} views")
        done += 1
    for scene_dir in sorted(glob.glob(os.path.join(args.dataset_root, "*"))):
        scene_id = os.path.basename(scene_dir)
        if scene_id not in asset_dirs:
            continue
        if os.path.isdir(os.path.join(scene_dir, "color")):
            v = process_scene_dirs(
                scene_dir,
                asset_dirs[scene_id],
                frame_gap=args.frame_gap if args.frame_gap is not None else 1,
                max_images=args.max_images,
                depth_tol=args.depth_tol,
            )
        elif os.path.exists(os.path.join(scene_dir, args.sfm_subdir, "cameras.txt")):
            # ScanNet++-style COLMAP scene
            v = process_scene_colmap(
                scene_dir,
                asset_dirs[scene_id],
                frame_gap=args.frame_gap if args.frame_gap is not None else 5,
                max_images=args.max_images,
                depth_tol=args.depth_tol,
                sfm_subdir=args.sfm_subdir,
                image_subdir=args.image_subdir,
            )
        elif os.path.exists(os.path.join(scene_dir, "lowres_wide.traj")):
            # ARKitScenes scene
            v = process_scene_arkit(
                scene_dir,
                asset_dirs[scene_id],
                frame_gap=args.frame_gap if args.frame_gap is not None else 10,
                max_images=args.max_images,
                depth_tol=args.depth_tol,
            )
        else:
            continue
        print(f"{scene_id}: {v} views")
        done += 1
    print(f"processed {done} scenes")


if __name__ == "__main__":
    main()
