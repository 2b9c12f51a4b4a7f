"""Generate ScanNet data-efficient benchmark assets (VERDICT r3 item 8).

The 8 ``semseg-spunet-v1m1-2-efficient-*`` configs consume two asset kinds
(reference `pointcept/datasets/scannet.py:34-57` contract; the reference
repo downloads them from the ScanNet data-efficient benchmark and ships no
generator — this tool makes the configs runnable end-to-end on any
preprocessed scannet-layout tree, synthetic fixtures included):

* limited annotations (LA): ``tasks/points/points{K}.npy`` — a pickled dict
  ``{scene_name: int64[K] point indices}``.  Sampling follows the official
  benchmark's instance-stratified protocol: rounds of one point per
  instance (nearest-to-centroid first, then outward), so even K=20 covers
  every object instance in the scene before densifying any of them.
* limited reconstructions (LR): ``tasks/scenes/scene{P}.txt`` — a
  deterministic P% subset of the train scene names, one per line.

Usage:
    python tools/generate_data_efficient_splits.py --data-root data/scannet \
        --points 20 50 100 200 --scenes 1 5 10 20
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def sample_limited_annotations(scene_dir: str, k: int, seed: int = 0) -> np.ndarray:
    """Instance-stratified K-point sample for one scene directory."""
    rng = np.random.default_rng(seed)
    coord = np.load(os.path.join(scene_dir, "coord.npy")).reshape(-1, 3)
    n = len(coord)
    seg_file = None
    for name in ("segment20.npy", "segment200.npy", "segment.npy"):
        p = os.path.join(scene_dir, name)
        if os.path.exists(p):
            seg_file = p
            break
    segment = (
        np.load(seg_file).reshape(-1) if seg_file is not None else np.zeros(n, np.int64)
    )
    inst_file = os.path.join(scene_dir, "instance.npy")
    instance = (
        np.load(inst_file).reshape(-1)
        if os.path.exists(inst_file)
        else segment.copy()  # fall back: stratify over semantic classes
    )
    labeled = segment >= 0
    if not labeled.any():
        return rng.choice(n, size=min(k, n), replace=False).astype(np.int64)

    groups = []
    for g in np.unique(instance[labeled]):
        if g < 0:
            continue
        idx = np.nonzero(labeled & (instance == g))[0]
        centroid = coord[idx].mean(0)
        order = np.argsort(np.linalg.norm(coord[idx] - centroid, axis=1))
        groups.append(idx[order])
    if not groups:
        pool = np.nonzero(labeled)[0]
        return rng.choice(pool, size=min(k, len(pool)), replace=False).astype(np.int64)
    rng.shuffle(groups)

    picked = []
    round_i = 0
    while len(picked) < k and round_i < max(len(g) for g in groups):
        for g in groups:
            if round_i < len(g) and len(picked) < k:
                picked.append(g[round_i])
        round_i += 1
    return np.asarray(picked[:k], np.int64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True, help="preprocessed scannet root (train/ val/)")
    ap.add_argument("--points", type=int, nargs="*", default=[20, 50, 100, 200])
    ap.add_argument("--scenes", type=int, nargs="*", default=[1, 5, 10, 20])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    train_dir = os.path.join(args.data_root, "train")
    scenes = sorted(
        d for d in os.listdir(train_dir) if os.path.isdir(os.path.join(train_dir, d))
    )
    if not scenes:
        raise FileNotFoundError(f"no scene dirs under {train_dir}")

    points_dir = os.path.join(args.data_root, "tasks", "points")
    scenes_dir = os.path.join(args.data_root, "tasks", "scenes")
    os.makedirs(points_dir, exist_ok=True)
    os.makedirs(scenes_dir, exist_ok=True)

    for k in args.points:
        la = {
            name: sample_limited_annotations(
                os.path.join(train_dir, name), k, seed=args.seed + hash(name) % 10000
            )
            for name in scenes
        }
        out = os.path.join(points_dir, f"points{k}.npy")
        np.save(out, la, allow_pickle=True)
        print(f"wrote {out} ({len(la)} scenes, {k} pts each)")

    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(scenes))
    for p in args.scenes:
        m = max(1, int(round(len(scenes) * p / 100.0)))
        subset = sorted(scenes[i] for i in order[:m])
        out = os.path.join(scenes_dir, f"scene{p}.txt")
        with open(out, "w") as f:
            f.write("\n".join(subset) + "\n")
        print(f"wrote {out} ({m}/{len(scenes)} scenes)")


if __name__ == "__main__":
    main()
