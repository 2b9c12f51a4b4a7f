"""Inspect a .npy point-cloud asset: shape, dtype, per-column stats, NaN counts.

Parity surface: reference `tools/inspect_npy.py`."""

import argparse
import os

import numpy as np

COLUMN_NAMES = ["x", "y", "z", "nx", "ny", "nz", "curvature", "class"]


def inspect_npy(file_path, num_samples=5):
    if not os.path.exists(file_path):
        print(f"Error: File {file_path} does not exist.")
        return
    print(f"{'=' * 20} Inspecting: {os.path.basename(file_path)} {'=' * 20}")
    data = np.load(file_path)
    print("Basic Information:")
    print(f"  - Shape: {data.shape}")
    print(f"  - DataType: {data.dtype}")
    print(f"  - Total Points: {len(data)}")
    print(f"  - Memory Usage: {data.nbytes / 1024 / 1024:.2f} MB")

    if data.ndim == 2:
        print("\nColumn-wise Statistics (min / max / mean / NaN):")
        for i in range(data.shape[1]):
            col = data[:, i]
            name = COLUMN_NAMES[i] if i < len(COLUMN_NAMES) else f"col{i}"
            nan = int(np.isnan(col).sum())
            finite = col[np.isfinite(col)]
            if len(finite):
                print(f"  - {name:10s}: {finite.min():12.4f} {finite.max():12.4f} {finite.mean():12.4f}  NaN={nan}")
            else:
                print(f"  - {name:10s}: all-NaN")
        print(f"\nFirst {num_samples} rows:")
        print(np.array2string(data[:num_samples], precision=4, suppress_small=True))
    else:
        print(f"values: min={np.nanmin(data)}, max={np.nanmax(data)}, NaN={int(np.isnan(data).sum())}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="+")
    ap.add_argument("--num-samples", type=int, default=5)
    args = ap.parse_args()
    for p in args.paths:
        inspect_npy(p, args.num_samples)


if __name__ == "__main__":
    main()
