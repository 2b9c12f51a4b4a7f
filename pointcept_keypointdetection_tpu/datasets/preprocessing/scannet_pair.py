"""ScanNet frame-pair preprocessing (PointContrast view pairs).

Parity surface: `pointcept/datasets/preprocessing/scannet/scannet_pair/*` —
the reference pipeline parses each scene's ``.sens`` RGB-D stream
(`SensorData.py`), unprojects every ``frame_skip``-th depth frame into a
world-frame partial point cloud (`point_cloud_extractor.py`), and writes an
``overlap.txt`` manifest of pairwise overlap ratios
(`compute_full_overlapping.py`) consumed by ``ScanNetPairDataset``.

This rebuild is dependency-light: the ``.sens`` parser streams with plain
``struct``/``zlib`` (JPEG color via PIL only when color export is requested),
and the overlap ratio uses voxel-hash radius matching instead of an Open3D
KD-tree — identical semantics (fraction of downsampled points of one cloud
with a neighbour of the other within ``1.5 * voxel_size``).
"""

from __future__ import annotations

import argparse
import glob
import io
import os
import struct
import zlib
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

COMPRESSION_TYPE_COLOR = {-1: "unknown", 0: "raw", 1: "png", 2: "jpeg"}
COMPRESSION_TYPE_DEPTH = {-1: "unknown", 0: "raw_ushort", 1: "zlib_ushort", 2: "occi_ushort"}


@dataclass
class SensFrame:
    pose: np.ndarray  # camera_to_world [4, 4]
    depth: np.ndarray  # uint16 [H, W], millimeters / depth_shift
    color: Optional[np.ndarray]  # uint8 [H, W, 3] or None


class SensReader:
    """Streaming parser for the ScanNet ``.sens`` v4 container
    (`scannet_pair/SensorData.py:55-95`)."""

    def __init__(self, path: str):
        self.file = open(path, "rb")
        f = self.file
        version = struct.unpack("I", f.read(4))[0]
        assert version == 4, f"unsupported .sens version {version}"
        strlen = struct.unpack("Q", f.read(8))[0]
        self.sensor_name = f.read(strlen).decode("ascii", "replace")
        self.intrinsic_color = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
        self.extrinsic_color = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
        self.intrinsic_depth = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
        self.extrinsic_depth = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
        self.color_compression = COMPRESSION_TYPE_COLOR[struct.unpack("i", f.read(4))[0]]
        self.depth_compression = COMPRESSION_TYPE_DEPTH[struct.unpack("i", f.read(4))[0]]
        self.color_width = struct.unpack("I", f.read(4))[0]
        self.color_height = struct.unpack("I", f.read(4))[0]
        self.depth_width = struct.unpack("I", f.read(4))[0]
        self.depth_height = struct.unpack("I", f.read(4))[0]
        self.depth_shift = struct.unpack("f", f.read(4))[0]
        self.num_frames = struct.unpack("Q", f.read(8))[0]

    def close(self):
        self.file.close()

    def frames(self, frame_skip: int = 1, load_color: bool = False) -> Iterator[SensFrame]:
        f = self.file
        for i in range(self.num_frames):
            pose = np.frombuffer(f.read(64), np.float32).reshape(4, 4).copy()
            f.read(16)  # timestamps
            color_bytes = struct.unpack("Q", f.read(8))[0]
            depth_bytes = struct.unpack("Q", f.read(8))[0]
            color_data = f.read(color_bytes)
            depth_data = f.read(depth_bytes)
            if i % frame_skip != 0:
                continue
            if self.depth_compression == "zlib_ushort":
                depth_raw = zlib.decompress(depth_data)
            elif self.depth_compression == "raw_ushort":
                depth_raw = depth_data
            else:
                raise ValueError(f"unsupported depth compression {self.depth_compression}")
            depth = np.frombuffer(depth_raw, np.uint16).reshape(
                self.depth_height, self.depth_width
            )
            color = None
            if load_color:
                from PIL import Image

                color = np.asarray(Image.open(io.BytesIO(color_data)).convert("RGB"))
            yield SensFrame(pose=pose, depth=depth, color=color)


def unproject_depth(
    depth: np.ndarray, intrinsic: np.ndarray, pose: np.ndarray, depth_shift: float = 1000.0
):
    """Depth image -> world-frame coordinates + the valid-pixel mask
    (`scannet_pair/point_cloud_extractor.py:44-76` semantics)."""
    h, w = depth.shape
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    v, u = np.mgrid[0:h, 0:w]
    z = depth.astype(np.float32) / depth_shift
    valid = z > 0
    x = (u - cx) / fx * z
    y = (v - cy) / fy * z
    cam = np.stack([x[valid], y[valid], z[valid]], axis=-1)
    world = cam @ pose[:3, :3].T + pose[:3, 3]
    return world.astype(np.float32), valid


def voxel_downsample(coord: np.ndarray, voxel_size: float) -> np.ndarray:
    """One representative point (the first) per occupied voxel."""
    grid = np.floor(coord / voxel_size).astype(np.int64)
    _, first = np.unique(
        grid[:, 0] * 73856093 ^ grid[:, 1] * 19349669 ^ grid[:, 2] * 83492791,
        return_index=True,
    )
    return coord[first]


def overlap_ratio(coord0: np.ndarray, coord1: np.ndarray, voxel_size: float) -> float:
    """max(|matched(0->1)|/|0|, |matched(1->0)|/|1|) with match radius
    1.5 * voxel_size — the reference's exact semantics
    (`compute_full_overlapping.py:30-48`), via a cKDTree radius query."""
    from scipy.spatial import cKDTree

    def directional(src: np.ndarray, dst: np.ndarray) -> float:
        if len(src) == 0 or len(dst) == 0:
            return 0.0
        dist, _ = cKDTree(dst).query(
            src, k=1, distance_upper_bound=1.5 * voxel_size
        )
        return float(np.isfinite(dist).sum()) / len(src)

    p0 = voxel_downsample(coord0, voxel_size)
    p1 = voxel_downsample(coord1, voxel_size)
    return max(directional(p0, p1), directional(p1, p0))


def extract_scene(
    sens_path: str,
    output_dir: str,
    frame_skip: int = 25,
    voxel_size: float = 0.05,
    export_color: bool = True,
    max_frames: Optional[int] = None,
):
    """Parse one scene: frame point clouds into ``<scene>/pcd/*.npz`` plus the
    pairwise ``overlap.txt`` manifest."""
    scene_id = os.path.basename(os.path.dirname(sens_path)) or os.path.splitext(
        os.path.basename(sens_path)
    )[0]
    pcd_dir = os.path.join(output_dir, scene_id, "pcd")
    os.makedirs(pcd_dir, exist_ok=True)

    reader = SensReader(sens_path)
    clouds = []
    try:
        for i, frame in enumerate(reader.frames(frame_skip=frame_skip, load_color=export_color)):
            if max_frames is not None and i >= max_frames:
                break
            if not np.isfinite(frame.pose).all():
                continue
            coord, valid = unproject_depth(
                frame.depth, reader.intrinsic_depth, frame.pose, reader.depth_shift
            )
            if coord.shape[0] == 0:
                continue
            rel = os.path.join(scene_id, "pcd", f"{i * frame_skip}.npz")
            arrays = {"coord": coord}
            if frame.color is not None:
                from PIL import Image

                color = np.asarray(
                    Image.fromarray(frame.color).resize(
                        (frame.depth.shape[1], frame.depth.shape[0])
                    )
                )
                arrays["color"] = color.reshape(-1, 3)[valid.reshape(-1)].astype(np.float32)
            np.savez(os.path.join(output_dir, rel), **arrays)
            clouds.append((rel, coord))
    finally:
        reader.close()

    with open(os.path.join(pcd_dir, "overlap.txt"), "w") as f:
        for i in range(len(clouds)):
            for j in range(i + 1, len(clouds)):
                ratio = overlap_ratio(clouds[i][1], clouds[j][1], voxel_size)
                f.write(f"{clouds[i][0]} {clouds[j][0]} {ratio:.4f}\n")
    return len(clouds)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset_root", required=True, help="ScanNet root with scans/scene*/*.sens")
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--frame_skip", type=int, default=25)
    parser.add_argument("--voxel_size", type=float, default=0.05)
    parser.add_argument("--no_color", action="store_true")
    args = parser.parse_args()

    sens_list = sorted(glob.glob(os.path.join(args.dataset_root, "scans", "scene*", "*.sens")))
    for sens_path in sens_list:
        n = extract_scene(
            sens_path,
            args.output_root,
            frame_skip=args.frame_skip,
            voxel_size=args.voxel_size,
            export_color=not args.no_color,
        )
        print(f"{sens_path}: {n} frames")


if __name__ == "__main__":
    main()
