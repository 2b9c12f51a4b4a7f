"""PLY reader + ScanNet preprocessing roundtrip."""

import json
import os

import numpy as np

from pointcept_keypointdetection_tpu.datasets.preprocessing.ply import read_ply, vertex_arrays
from pointcept_keypointdetection_tpu.utils.visualization import save_point_cloud


def test_ply_ascii_roundtrip(tmp_path, rng):
    coord = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
    color = rng.integers(0, 255, (50, 3)).astype(np.uint8)
    path = str(tmp_path / "cloud.ply")
    save_point_cloud(path, coord, color)
    ply = read_ply(path)
    c2, col2, _ = vertex_arrays(ply)
    np.testing.assert_allclose(c2, coord, rtol=1e-5)
    np.testing.assert_array_equal(col2.astype(np.uint8), color)


def test_ply_binary(tmp_path, rng):
    n = 40
    coord = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    label = rng.integers(0, 40, n).astype(np.uint16)
    path = str(tmp_path / "bin.ply")
    with open(path, "wb") as f:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {n}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property ushort label\nend_header\n"
        )
        f.write(header.encode())
        rec = np.zeros(n, dtype=np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("label", "<u2")]))
        rec["x"], rec["y"], rec["z"] = coord.T
        rec["label"] = label
        f.write(rec.tobytes())
    ply = read_ply(path)
    v = ply["vertex"]
    np.testing.assert_allclose(np.stack([v["x"], v["y"], v["z"]], 1), coord, rtol=1e-6)
    np.testing.assert_array_equal(v["label"], label)


def test_scannet_preprocess_scene(tmp_path, rng):
    from pointcept_keypointdetection_tpu.datasets.preprocessing.scannet import process_scene

    scene = "scene0000_00"
    scene_dir = tmp_path / scene
    scene_dir.mkdir()
    n = 60
    coord = rng.uniform(0, 2, (n, 3)).astype(np.float32)
    color = rng.integers(0, 255, (n, 3)).astype(np.uint8)
    save_point_cloud(str(scene_dir / f"{scene}_vh_clean_2.ply"), coord, color)
    # labels ply (ascii with ushort label column)
    with open(scene_dir / f"{scene}_vh_clean_2.labels.ply", "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\nproperty ushort label\n")
        f.write("end_header\n")
        labels = rng.choice([1, 2, 39, 0], n)
        for i in range(n):
            f.write(f"{coord[i, 0]} {coord[i, 1]} {coord[i, 2]} {labels[i]}\n")
    with open(scene_dir / f"{scene}.aggregation.json", "w") as f:
        json.dump({"segGroups": [{"segments": [0, 1]}, {"segments": [2]}]}, f)
    with open(scene_dir / f"{scene}_vh_clean_2.0.010000.segs.json", "w") as f:
        json.dump({"segIndices": (np.arange(n) % 3).tolist()}, f)

    out = tmp_path / "out"
    process_scene(str(scene_dir), str(out))
    assert (out / "coord.npy").exists()
    seg = np.load(out / "segment20.npy")
    assert seg.shape == (n,)
    assert set(np.unique(seg)) <= {-1, 0, 1, 19}
    inst = np.load(out / "instance.npy")
    assert set(np.unique(inst)) == {0, 1}
