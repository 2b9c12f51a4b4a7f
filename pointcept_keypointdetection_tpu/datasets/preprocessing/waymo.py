"""Waymo Open preprocessing: tfrecords -> per-frame npy dirs.

Parity surface: `pointcept/datasets/preprocessing/waymo/preprocess_waymo.py` —
per segmentation-labeled frame: decode both lidar returns from the range
images via the waymo toolkit, concatenate xyz + intensity + elongation, decode
the (instance, semantic) segmentation labels for the TOP lidar, save
coord/strength/segment npy dirs named ``<context>_<timestamp>``.

Requires ``pip install waymo-open-dataset-tf-2-11-0`` in a separate venv
(its TF pin conflicts with this image — the reference has the same split).
"""

from __future__ import annotations

import argparse
import glob
import os
from concurrent.futures import ProcessPoolExecutor
from itertools import repeat

import numpy as np

try:  # pragma: no cover - optional heavy dependency
    import tensorflow as tf
    from waymo_open_dataset import dataset_pb2
    from waymo_open_dataset.utils import frame_utils
except ImportError:
    tf = None


def create_lidar(frame):
    """Both returns of every lidar, concatenated in vehicle frame:
    [x y z intensity elongation] (`preprocess_waymo.py:31-71`)."""
    (range_images, camera_projections, segmentation_labels, range_image_top_pose) = (
        frame_utils.parse_range_image_and_camera_projection(frame)
    )
    points_all = []
    for ri_index in (0, 1):
        points, _ = frame_utils.convert_range_image_to_point_cloud(
            frame, range_images, camera_projections, range_image_top_pose,
            ri_index=ri_index, keep_polar_features=True,
        )
        # keep_polar_features rows: [range, intensity, elongation, x, y, z]
        points_all.append(
            np.concatenate([np.concatenate([p[:, 3:6], p[:, 1:3]], axis=1) for p in points], axis=0)
        )
    return np.concatenate(points_all, axis=0), range_images, segmentation_labels, range_image_top_pose


def create_label(frame, range_images, segmentation_labels):
    """Per-point (instance, semantic) labels for the TOP lidar, both returns;
    -1 where unlabeled (`preprocess_waymo.py:73-116`)."""
    labels = []
    for ri_index in (0, 1):
        for c in frame.context.laser_calibrations:
            if c.name != dataset_pb2.LaserName.TOP:
                continue
        ri = range_images[dataset_pb2.LaserName.TOP][ri_index]
        ri_tensor = tf.reshape(tf.convert_to_tensor(ri.data), ri.shape.dims)
        mask = ri_tensor[..., 0] > 0
        if dataset_pb2.LaserName.TOP in segmentation_labels:
            sl = segmentation_labels[dataset_pb2.LaserName.TOP][ri_index]
            sl_tensor = tf.reshape(tf.convert_to_tensor(sl.data), sl.shape.dims)
            sl_points = tf.gather_nd(sl_tensor, tf.where(mask)).numpy()
        else:
            sl_points = np.full((int(tf.reduce_sum(tf.cast(mask, tf.int32))), 2), -1, np.int32)
        labels.append(sl_points)
    return np.concatenate(labels, axis=0)


def load_test_set_frames(path):
    """Official 3D-semseg test-set frame list: lines of
    ``<context_name>,<timestamp_micros>`` (the reference ships this as
    ``preprocessing/waymo/3d_semseg_test_set_frames.txt`` and filters the
    testing split to exactly those 2982 frames,
    `preprocess_waymo.py:371-375`; the list itself is published by the Waymo
    open-dataset challenge — pass it via --test_frame_file)."""
    with open(path) as f:
        return {line.strip() for line in f if line.strip()}


def handle_segment(path, output_root, split, test_frames=None):
    print(f"processing {os.path.basename(path)}")
    dataset = tf.data.TFRecordDataset(path, compression_type="")
    for data in dataset:
        frame = dataset_pb2.Frame()
        frame.ParseFromString(bytearray(data.numpy()))
        # only frames carrying segmentation labels matter for semseg
        if split != "testing" and not frame.lasers[0].ri_return1.segmentation_label_compressed:
            continue
        if split == "testing" and test_frames is not None:
            key = f"{frame.context.name},{frame.timestamp_micros}"
            if key not in test_frames:
                continue
        points, range_images, seg_labels, _ = create_lidar(frame)
        name = f"{frame.context.name}_{frame.timestamp_micros}"
        out = os.path.join(output_root, split, name)
        os.makedirs(out, exist_ok=True)
        np.save(os.path.join(out, "coord.npy"), points[:, :3].astype(np.float32))
        np.save(os.path.join(out, "strength.npy"), np.tanh(points[:, 3:4]).astype(np.float32))
        if split != "testing":
            label = create_label(frame, range_images, seg_labels)
            # column 1 = semantic class; shift so 0 (undefined) becomes -1
            np.save(os.path.join(out, "segment.npy"), (label[:, 1] - 1).astype(np.int32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", required=True, help="dir with training/validation/testing tfrecords")
    ap.add_argument("--output_root", required=True)
    ap.add_argument("--splits", nargs="+", default=["training", "validation"])
    ap.add_argument("--num_workers", type=int, default=4)
    ap.add_argument(
        "--test_frame_file",
        default=None,
        help="official 3d_semseg_test_set_frames.txt (context,timestamp per "
        "line); required to restrict the testing split to submission frames",
    )
    args = ap.parse_args()

    if tf is None:
        raise SystemExit(
            "waymo-open-dataset / tensorflow not installed. Create a separate "
            "venv (`pip install waymo-open-dataset-tf-2-11-0`) and re-run."
        )
    test_frames = (
        load_test_set_frames(args.test_frame_file) if args.test_frame_file else None
    )
    if "testing" in args.splits and test_frames is None:
        print("WARNING: testing split without --test_frame_file exports ALL frames")
    for split in args.splits:
        records = sorted(glob.glob(os.path.join(args.dataset_root, split, "*.tfrecord*")))
        print(f"{split}: {len(records)} segments")
        with ProcessPoolExecutor(max_workers=args.num_workers) as pool:
            list(pool.map(
                handle_segment,
                records,
                repeat(args.output_root),
                repeat(split),
                repeat(test_frames),
            ))


if __name__ == "__main__":
    main()
