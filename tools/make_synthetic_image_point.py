"""Generate a synthetic ImagePointDataset tree (points + images +
point->pixel correspondences) for Concerto smoke training.

Layout per scene dir: coord/color/normal .npy, images.npy [V, H, W, 3] u8,
correspondence.npy [N, V, 2] (x, y pixel coords, -1 = no match).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_scene(rng, out_dir, n=2000, v=3, h=48, w=48):
    os.makedirs(out_dir, exist_ok=True)
    coord = rng.uniform(0, 3.0, (n, 3)).astype(np.float32)
    color = rng.uniform(0, 255, (n, 3)).astype(np.float32)
    normal = rng.normal(size=(n, 3)).astype(np.float32)
    normal /= np.maximum(np.linalg.norm(normal, axis=1, keepdims=True), 1e-6)
    images = (rng.random((v, h, w, 3)) * 255).astype(np.uint8)
    # project a random half of the points into each view
    corr = np.full((n, v, 2), -1, np.int32)
    for i in range(v):
        sel = rng.random(n) < 0.5
        corr[sel, i, 0] = rng.integers(0, w, sel.sum())  # x
        corr[sel, i, 1] = rng.integers(0, h, sel.sum())  # y
    np.save(os.path.join(out_dir, "coord.npy"), coord)
    np.save(os.path.join(out_dir, "color.npy"), color)
    np.save(os.path.join(out_dir, "normal.npy"), normal)
    np.save(os.path.join(out_dir, "images.npy"), images)
    np.save(os.path.join(out_dir, "correspondence.npy"), corr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--points", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    for i in range(args.scenes):
        make_scene(rng, os.path.join(args.out, "train", f"scene{i:04d}"), n=args.points)
    print(f"wrote {args.scenes} scenes under {args.out}/train")


if __name__ == "__main__":
    main()
