"""Offline scene chunking: split huge scenes into BEV tiles.

Parity surface: `pointcept/datasets/preprocessing/sampling_chunking_data.py` —
optionally grid-sample a scene, then cut overlapping (range x range) BEV
chunks at the given stride, writing each chunk as its own npy-dir sample under
``<split>_grid..._chunk...x..._stride...x.../<scene>_<i>``.
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ProcessPoolExecutor
from itertools import repeat
from pathlib import Path

import numpy as np


def chunking_scene(
    name,
    dataset_root,
    split,
    grid_size=None,
    chunk_range=(6, 6),
    chunk_stride=(3, 3),
    chunk_minimum_size=10000,
):
    print(f"chunking {split}/{name}")
    dataset_root = Path(dataset_root)
    scene_path = dataset_root / split / name
    data_dict = {
        asset[:-4]: np.load(scene_path / asset)
        for asset in os.listdir(scene_path)
        if asset.endswith(".npy")
    }
    coord = data_dict["coord"] - data_dict["coord"].min(axis=0)

    if grid_size is not None:
        grid_coord = np.floor(coord / grid_size).astype(np.int64)
        _, idx = np.unique(grid_coord, axis=0, return_index=True)
        coord = coord[idx]
        data_dict = {k: v[idx] for k, v in data_dict.items()}

    bev = coord.max(axis=0)[:2]
    xs = np.arange(0, max(bev[0] + chunk_stride[0] - chunk_range[0], chunk_stride[0]), chunk_stride[0])
    ys = np.arange(0, max(bev[1] + chunk_stride[1] - chunk_range[1], chunk_stride[1]), chunk_stride[1])
    if grid_size is not None:
        chunk_split = (
            f"{split}_grid{grid_size * 100:.0f}mm_"
            f"chunk{chunk_range[0]}x{chunk_range[1]}_stride{chunk_stride[0]}x{chunk_stride[1]}"
        )
    else:
        chunk_split = f"{split}_chunk{chunk_range[0]}x{chunk_range[1]}_stride{chunk_stride[0]}x{chunk_stride[1]}"

    chunk_idx = 0
    for cx in xs:
        for cy in ys:
            mask = (
                (coord[:, 0] >= cx) & (coord[:, 0] < cx + chunk_range[0])
                & (coord[:, 1] >= cy) & (coord[:, 1] < cy + chunk_range[1])
            )
            if mask.sum() < chunk_minimum_size:
                continue
            out = dataset_root / chunk_split / f"{name}_{chunk_idx}"
            out.mkdir(parents=True, exist_ok=True)
            for key, val in data_dict.items():
                np.save(out / f"{key}.npy", val[mask])
            chunk_idx += 1
    return chunk_idx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", required=True)
    ap.add_argument("--split", default="train")
    ap.add_argument("--grid_size", type=float, default=None)
    ap.add_argument("--chunk_range", type=float, nargs=2, default=(6, 6))
    ap.add_argument("--chunk_stride", type=float, nargs=2, default=(3, 3))
    ap.add_argument("--chunk_minimum_size", type=int, default=10000)
    ap.add_argument("--num_workers", type=int, default=mp_count())
    args = ap.parse_args()

    names = sorted(os.listdir(os.path.join(args.dataset_root, args.split)))
    print(f"{len(names)} scenes in {args.split}")
    with ProcessPoolExecutor(max_workers=args.num_workers) as pool:
        list(
            pool.map(
                chunking_scene,
                names,
                repeat(args.dataset_root),
                repeat(args.split),
                repeat(args.grid_size),
                repeat(tuple(args.chunk_range)),
                repeat(tuple(args.chunk_stride)),
                repeat(args.chunk_minimum_size),
            )
        )


def mp_count():
    import multiprocessing

    return max(multiprocessing.cpu_count() // 2, 1)


if __name__ == "__main__":
    main()
