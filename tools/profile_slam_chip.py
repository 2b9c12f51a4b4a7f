"""On-chip SLAM odometry throughput (BASELINE.json's literal frames/s/chip
metric applied to the odometry stage — VERDICT r2 item 3).

Runs the jitted per-scan odometry update (point-to-plane ICP against the
sliding voxel map, 16k scan x 262k map capacity) on the live backend over a
synthetic KITTI street sequence and reports steady-state scans/s.  The
round-2 CPU figure was 0.19 scans/s on 2 contended cores.

Usage:
    python tools/profile_slam_chip.py [--frames 40] [--data /tmp/synth_kitti]
    JAX_PLATFORMS=cpu python tools/profile_slam_chip.py   # CPU comparison
"""

import argparse
import glob
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _enable_compile_cache():
    import jax

    if jax.default_backend() == "cpu":
        return
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/synth_kitti_chip")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--search-every", type=int, default=1,
                    help="correspondence search every m-th ICP iteration (lazy re-association)")
    args = ap.parse_args()

    seq_dir = os.path.join(args.data, "dataset", "sequences", "00", "velodyne")
    if not os.path.isdir(seq_dir) or len(glob.glob(os.path.join(seq_dir, "*.bin"))) < args.frames:
        subprocess.run(
            [
                sys.executable,
                os.path.join(os.path.dirname(__file__), "make_synthetic_kitti.py"),
                "--out", args.data, "--frames", str(args.frames), "--n-cars", "0",
            ],
            check=True,
        )

    _enable_compile_cache()
    import jax

    from pointcept_keypointdetection_tpu.datasets.semantic_kitti import read_scan
    from pointcept_keypointdetection_tpu.slam.pipeline import LidarOdometry, OdometryConfig

    scans = sorted(glob.glob(os.path.join(seq_dir, "*.bin")))[: args.frames]
    odo = LidarOdometry(OdometryConfig(search_every=args.search_every))
    print(f"# backend: {jax.default_backend()}", file=sys.stderr)

    t_compile = time.perf_counter()
    for path in scans[: args.warmup]:
        pose = odo.process(read_scan(path))
        _ = float(np.asarray(pose).sum())  # fetch to force completion
    print(
        f"# warmup {args.warmup} scans (incl. compile) in {time.perf_counter() - t_compile:.1f}s",
        file=sys.stderr,
    )

    t0 = time.perf_counter()
    n = 0
    for path in scans[args.warmup :]:
        pose = odo.process(read_scan(path))
        _ = float(np.asarray(pose).sum())
        n += 1
    dt = time.perf_counter() - t0
    print(
        f"slam_odometry_scans_per_sec: {n / dt:.3f} "
        f"({n} scans in {dt:.1f}s, scan_cap {odo.cfg.scan_capacity}, "
        f"search_every {odo.cfg.search_every}, "
        f"map_cap {odo.cfg.map_capacity}, backend {jax.default_backend()})"
    )


if __name__ == "__main__":
    main()
