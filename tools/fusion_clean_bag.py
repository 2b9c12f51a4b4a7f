"""Semantic-clean rosbag builder for an external FAST-LIO2 stack.

Parity surface: `SemanticFAST-LIO2-prediction/fusion_clean_bag.py` (predicted
labels) and `fusion_gt_clean_bag.py` (GT labels): merge the raw KITTI drive's
high-rate IMU stream with odometry .bin scans + per-scan semantic labels,
DROP DYNAMIC CLASSES (learning-map labels 0..7: car..person etc.,
`fusion_clean_bag.py:93-95`), and write `/kitti/velodyne` (PointCloud2) +
`/kitti/oxts/imu` (Imu) into a rosbag — here via the framework's own
pure-Python rosbag writer (no ROS needed).

Usage:
  python tools/fusion_clean_bag.py \
      --raw-root  <.../2011_09_30_drive_0018_extract> \
      --bin-dir   <.../sequences/05/velodyne> \
      --pred-dir  <exp/.../results/05>         # .npy labels; or --gt-dir for
      --gt-dir    <.../sequences/05/labels>    #   .label files (GT variant)
      --out kitti_05_clean.bag
"""

import argparse
import glob
import os
import sys
from datetime import datetime

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pointcept_keypointdetection_tpu.datasets.semantic_kitti import LEARNING_MAP
from pointcept_keypointdetection_tpu.slam.rosbag import (
    BagWriter,
    pack_kitti_scan,
    serialize_imu,
    serialize_pointcloud2,
)

DYNAMIC_MAX_LABEL = 7  # learning-map ids 0..7 are dynamic (car..person)


def parse_time(ts_str: str) -> float:
    ts_str = ts_str.strip()
    main_part, _, frac_part = ts_str.partition(".")
    frac_part = frac_part[:6].ljust(6, "0")
    dt = datetime.strptime(f"{main_part}.{frac_part}", "%Y-%m-%d %H:%M:%S.%f")
    return dt.timestamp()


def load_labels(pred_dir, gt_dir, frame_idx):
    if pred_dir is not None:
        path = os.path.join(pred_dir, f"{frame_idx:06d}.npy")
        return np.load(path) if os.path.exists(path) else None
    path = os.path.join(gt_dir, f"{frame_idx:06d}.label")
    if not os.path.exists(path):
        return None
    raw = np.fromfile(path, dtype=np.uint32) & 0xFFFF
    return np.vectorize(lambda x: LEARNING_MAP.get(int(x), -1))(raw)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw-root", required=True, help="raw KITTI drive *_extract dir (timestamps + oxts)")
    ap.add_argument("--bin-dir", required=True, help="odometry sequence velodyne dir (.bin)")
    ap.add_argument("--pred-dir", default=None, help="predicted per-scan label .npy dir")
    ap.add_argument("--gt-dir", default=None, help="GT .label dir (fusion_gt_clean_bag variant)")
    ap.add_argument("--out", default="kitti_clean.bag")
    ap.add_argument("--keep-dynamic", action="store_true", help="skip the dynamic-class filter")
    args = ap.parse_args()
    assert (args.pred_dir is None) != (args.gt_dir is None), "give exactly one of --pred-dir/--gt-dir"

    events = []
    lidar_ts_file = os.path.join(args.raw_root, "velodyne_points", "timestamps.txt")
    with open(lidar_ts_file) as f:
        for i, line in enumerate(f):
            bin_path = os.path.join(args.bin_dir, f"{i:06d}.bin")
            if os.path.exists(bin_path):
                events.append(("lidar", parse_time(line), i, bin_path))

    imu_ts_file = os.path.join(args.raw_root, "oxts", "timestamps.txt")
    imu_dir = os.path.join(args.raw_root, "oxts", "data")
    with open(imu_ts_file) as f:
        for i, line in enumerate(f):
            txt = os.path.join(imu_dir, f"{i:010d}.txt")
            if os.path.exists(txt):
                events.append(("imu", parse_time(line), i, txt))

    events.sort(key=lambda e: e[1])
    print(f"fusing {len(events)} events -> {args.out}")

    n_dropped = n_total = 0
    with BagWriter(args.out) as bag:
        for seq, (kind, ts, idx, path) in enumerate(events):
            if kind == "lidar":
                scan = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
                if not args.keep_dynamic:
                    labels = load_labels(args.pred_dir, args.gt_dir, idx)
                    if labels is None:
                        continue
                    dynamic = (labels >= 0) & (labels <= DYNAMIC_MAX_LABEL)
                    n_dropped += int(dynamic.sum())
                    n_total += len(scan)
                    scan = scan[~dynamic]
                raw = serialize_pointcloud2(
                    seq, ts, "camera_init", pack_kitti_scan(scan), scan.shape[0]
                )
                bag.write("/kitti/velodyne", "sensor_msgs/PointCloud2", raw, ts)
            else:
                values = [float(x) for x in open(path).read().split()]
                raw = serialize_imu(
                    seq, ts, "camera_init",
                    lin_acc=(values[14], values[15], values[16]),
                    ang_vel=(values[17], values[18], values[19]),
                )
                bag.write("/kitti/oxts/imu", "sensor_msgs/Imu", raw, ts)
            if seq % 2000 == 0 and seq > 0:
                print(f"  {seq}/{len(events)} events...")

    if n_total:
        print(f"dynamic points removed: {n_dropped}/{n_total} ({100 * n_dropped / n_total:.1f}%)")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
