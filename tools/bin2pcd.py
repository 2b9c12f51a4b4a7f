"""Convert KITTI .bin scans to PCD files.

Parity surface: `SemanticFAST-LIO2-prediction/bin2pcd.py` — batch-convert a
directory of SemanticKITTI velodyne ``.bin`` scans (float32 x,y,z,intensity)
to PCD v0.7.  The reference uses open3d; this writer emits the PCD header +
binary payload directly (no dependencies), preserving intensity.

Usage:
  python tools/bin2pcd.py --bin-dir <.../sequences/05/velodyne> --out-dir /tmp/pcd
"""

import argparse
import glob
import os

import numpy as np


def write_pcd(path: str, points: np.ndarray, binary: bool = True) -> None:
    """Write an [N, 4] (x, y, z, intensity) array as PCD v0.7."""
    n = points.shape[0]
    header = "\n".join(
        [
            "# .PCD v0.7 - Point Cloud Data file format",
            "VERSION 0.7",
            "FIELDS x y z intensity",
            "SIZE 4 4 4 4",
            "TYPE F F F F",
            "COUNT 1 1 1 1",
            f"WIDTH {n}",
            "HEIGHT 1",
            "VIEWPOINT 0 0 0 1 0 0 0",
            f"POINTS {n}",
            f"DATA {'binary' if binary else 'ascii'}",
            "",
        ]
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        if binary:
            f.write(np.ascontiguousarray(points, np.float32).tobytes())
        else:
            np.savetxt(f, points, fmt="%.6f")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bin-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--ascii", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    bins = sorted(glob.glob(os.path.join(args.bin_dir, "*.bin")))
    for path in bins:
        scan = np.fromfile(path, np.float32).reshape(-1, 4)
        name = os.path.splitext(os.path.basename(path))[0] + ".pcd"
        write_pcd(os.path.join(args.out_dir, name), scan, binary=not args.ascii)
    print(f"converted {len(bins)} scans -> {args.out_dir}")


if __name__ == "__main__":
    main()
