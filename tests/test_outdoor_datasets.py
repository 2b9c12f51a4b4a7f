"""NuScenes / Waymo reader parity (reference nuscenes.py / waymo.py)."""

import os
import pickle

import numpy as np
import pytest


def _write_npy_frame(frame_dir, n, pose=None, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(frame_dir, exist_ok=True)
    np.save(os.path.join(frame_dir, "coord.npy"), rng.normal(size=(n, 3)).astype(np.float32))
    np.save(os.path.join(frame_dir, "strength.npy"), rng.uniform(0, 1, (n, 1)).astype(np.float32))
    np.save(os.path.join(frame_dir, "segment.npy"), rng.integers(0, 5, n).astype(np.int64))
    if pose is not None:
        np.save(os.path.join(frame_dir, "pose.npy"), pose.astype(np.float64))


def test_nuscenes_info_mode(tmp_path):
    """Info-pkl + raw-bin reading with the 32->16 learning map
    (`nuscenes.py:47-93`)."""
    from pointcept_keypointdetection_tpu.datasets.outdoor import (
        NuScenesDataset,
        nuscenes_learning_map,
    )

    root = tmp_path / "nusc"
    (root / "info").mkdir(parents=True)
    (root / "raw" / "samples").mkdir(parents=True)
    n = 100
    rng = np.random.default_rng(0)
    pts = np.concatenate(
        [rng.normal(size=(n, 3)), rng.uniform(0, 255, (n, 1)), np.zeros((n, 1))], 1
    ).astype(np.float32)
    pts.tofile(root / "raw" / "samples" / "f0.bin")
    raw_labels = rng.integers(0, 32, n).astype(np.uint8)
    raw_labels.tofile(root / "raw" / "samples" / "f0_seg.bin")
    info = [dict(lidar_path="samples/f0.bin", gt_segment_path="samples/f0_seg.bin",
                 lidar_token="tok0")]
    with open(root / "info" / "nuscenes_infos_10sweeps_val.pkl", "wb") as f:
        pickle.dump(info, f)

    ds = NuScenesDataset(split="val", data_root=str(root), transform=[], test_mode=False)
    sample = ds.get_data(0)
    assert sample["name"] == "tok0"
    assert sample["coord"].shape == (n, 3)
    np.testing.assert_allclose(sample["strength"], pts[:, 3:4] / 255.0, rtol=1e-6)
    lut = nuscenes_learning_map(-1)
    expected = np.array([lut[int(r)] for r in raw_labels])
    np.testing.assert_array_equal(sample["segment"], expected)


def test_waymo_temporal_aggregation(tmp_path):
    """Neighbor frames pose-align into the major frame; labels maskable and
    timestamps appendable (`waymo.py:57-108`)."""
    from pointcept_keypointdetection_tpu.datasets.outdoor import WaymoDataset

    root = tmp_path / "waymo"
    poses = []
    for i in range(3):
        T = np.eye(4)
        T[:3, 3] = [i * 2.0, 0, 0]  # sequence drives along +x
        poses.append(T)
        _write_npy_frame(str(root / "train" / "seq0" / f"{i:03d}"), 50, pose=T, seed=i)

    ds = WaymoDataset(
        split="train", data_root=str(root), transform=[], test_mode=False,
        timestamp=(0, -1, 1), reference_label=False, timing_embedding=True,
    )
    single = ds.get_single_frame(1)
    agg = ds.get_data(1)
    assert agg["coord"].shape[0] == 150  # 3 frames merged
    # timing embedding doubled the strength width
    assert agg["strength"].shape[1] == single["strength"].shape[1] + 1
    # major frame keeps labels; neighbors are masked to ignore_index
    assert (agg["segment"][:50] == single["segment"]).all()
    assert (agg["segment"][50:] == ds.ignore_index).all()
    # pose alignment: frame 0's points shift by -2 in x relative to frame 1
    f0 = ds.get_single_frame(0)
    np.testing.assert_allclose(agg["coord"][50:100], f0["coord"] + [-2.0, 0, 0], atol=1e-5)

    # boundary frames aggregate only in-sequence neighbors
    first = ds.get_data(0)
    assert first["coord"].shape[0] == 100
