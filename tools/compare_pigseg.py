"""Compare two pigseg dataset exports: xyz sets, normals, feature stats.

Parity surface: reference `tools/compare_pigseg_xyz_sets.py`,
`compare_pigseg_normals_between_sets.py`, `compare_pigseg_features.py` —
collapsed into one tool with a --mode switch.  Pairs same-named .npy files
from two directories and reports per-pair and aggregate deltas.
"""

import argparse
import glob
import os

import numpy as np


def pair_files(dir_a, dir_b):
    names_a = {os.path.basename(p): p for p in glob.glob(os.path.join(dir_a, "*.npy"))}
    names_b = {os.path.basename(p): p for p in glob.glob(os.path.join(dir_b, "*.npy"))}
    common = sorted(set(names_a) & set(names_b))
    only_a = sorted(set(names_a) - set(names_b))
    only_b = sorted(set(names_b) - set(names_a))
    if only_a:
        print(f"only in A ({len(only_a)}): {only_a[:5]}{'...' if len(only_a) > 5 else ''}")
    if only_b:
        print(f"only in B ({len(only_b)}): {only_b[:5]}{'...' if len(only_b) > 5 else ''}")
    return [(n, names_a[n], names_b[n]) for n in common]


def compare_xyz(a, b, tol):
    """Set-level xyz comparison: counts, bbox, nearest-neighbor residual."""
    xa, xb = a[:, :3], b[:, :3]
    print(f"    points: {len(xa)} vs {len(xb)}")
    print(f"    bbox A: {np.round(xa.min(0), 2)} .. {np.round(xa.max(0), 2)}")
    print(f"    bbox B: {np.round(xb.min(0), 2)} .. {np.round(xb.max(0), 2)}")
    if len(xa) == len(xb):
        d = np.linalg.norm(np.sort(xa.view("f4").reshape(len(xa), -1), axis=0)
                           - np.sort(xb.view("f4").reshape(len(xb), -1), axis=0), axis=1)
        print(f"    sorted-column residual: max={d.max():.4f} mean={d.mean():.4f}")
    # subsample nearest-neighbor distance A->B
    sub = xa[:: max(1, len(xa) // 2000)]
    d2 = ((sub[:, None, :] - xb[None, :: max(1, len(xb) // 5000), :]) ** 2).sum(-1)
    nn = np.sqrt(d2.min(axis=1))
    print(f"    NN(A->B, subsampled): mean={nn.mean():.4f} p95={np.percentile(nn, 95):.4f}")
    return float(nn.mean()) <= tol


def compare_normals(a, b, tol):
    na, nb = a[:, 3:6], b[:, 3:6]
    if len(na) != len(nb):
        print(f"    point counts differ ({len(na)} vs {len(nb)}); skipping per-row compare")
        return False
    cos = np.abs((na * nb).sum(-1) / (np.linalg.norm(na, axis=-1) * np.linalg.norm(nb, axis=-1) + 1e-9))
    print(f"    |cos(normal angle)|: mean={cos.mean():.4f} min={cos.min():.4f}")
    return float(1 - cos.mean()) <= tol


def compare_features(a, b, tol):
    ok = True
    for i in range(min(a.shape[1], b.shape[1])):
        ca, cb = a[:, i], b[:, i]
        dm = abs(ca.mean() - cb.mean())
        ds = abs(ca.std() - cb.std())
        print(f"    col{i}: mean {ca.mean():10.4f} vs {cb.mean():10.4f} (d={dm:.4f}); std d={ds:.4f}")
        ok &= dm <= tol
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dir_a")
    ap.add_argument("dir_b")
    ap.add_argument("--mode", default="xyz", choices=["xyz", "normals", "features"])
    ap.add_argument("--tol", type=float, default=1.0)
    args = ap.parse_args()

    fn = {"xyz": compare_xyz, "normals": compare_normals, "features": compare_features}[args.mode]
    pairs = pair_files(args.dir_a, args.dir_b)
    n_ok = 0
    for name, pa, pb in pairs:
        print(f"  {name}:")
        a, b = np.load(pa).astype(np.float32), np.load(pb).astype(np.float32)
        n_ok += bool(fn(a, b, args.tol))
    print(f"{n_ok}/{len(pairs)} pairs within tolerance ({args.mode}, tol={args.tol})")


if __name__ == "__main__":
    main()
