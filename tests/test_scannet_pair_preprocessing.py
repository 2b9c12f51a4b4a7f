""".sens parsing, frame unprojection, overlap manifests, and DINO lifting."""

import io
import os
import struct
import zlib

import numpy as np
import pytest

from pointcept_keypointdetection_tpu.datasets.preprocessing.dino import (
    GridAccumulator,
    bilinear_upsample,
    center_crop,
    lift_scene,
)
from pointcept_keypointdetection_tpu.datasets.preprocessing.scannet_pair import (
    SensReader,
    extract_scene,
    overlap_ratio,
    unproject_depth,
)


def _write_sens(path, depths, poses, color_shape=(8, 8)):
    """Minimal valid .sens v4 container with zlib depth + JPEG color."""
    from PIL import Image

    h, w = depths[0].shape
    buf = io.BytesIO()
    buf.write(struct.pack("I", 4))
    name = b"fake"
    buf.write(struct.pack("Q", len(name)))
    buf.write(name)
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 10.0  # fx, fy
    intr[0, 2], intr[1, 2] = w / 2, h / 2
    for mat in (intr, np.eye(4, dtype=np.float32), intr, np.eye(4, dtype=np.float32)):
        buf.write(mat.astype(np.float32).tobytes())
    buf.write(struct.pack("i", 2))  # color: jpeg
    buf.write(struct.pack("i", 1))  # depth: zlib_ushort
    buf.write(struct.pack("I", color_shape[1]))
    buf.write(struct.pack("I", color_shape[0]))
    buf.write(struct.pack("I", w))
    buf.write(struct.pack("I", h))
    buf.write(struct.pack("f", 1000.0))
    buf.write(struct.pack("Q", len(depths)))
    for depth, pose in zip(depths, poses):
        buf.write(pose.astype(np.float32).tobytes())
        buf.write(struct.pack("QQ", 0, 0))
        img = Image.fromarray(
            np.random.default_rng(0).integers(0, 255, (*color_shape, 3), np.uint8).astype(np.uint8)
        )
        jpg = io.BytesIO()
        img.save(jpg, format="JPEG")
        color_data = jpg.getvalue()
        depth_data = zlib.compress(depth.astype(np.uint16).tobytes())
        buf.write(struct.pack("QQ", len(color_data), len(depth_data)))
        buf.write(color_data)
        buf.write(depth_data)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def _scene_sens(tmp_path, n_frames=3):
    rng = np.random.default_rng(1)
    depths = [rng.integers(500, 3000, (16, 16)).astype(np.uint16) for _ in range(n_frames)]
    poses = []
    for i in range(n_frames):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.05 * i  # slight translation -> large overlap
        poses.append(pose)
    scene_dir = os.path.join(str(tmp_path), "scene0001_00")
    os.makedirs(scene_dir, exist_ok=True)
    sens_path = os.path.join(scene_dir, "scene0001_00.sens")
    _write_sens(sens_path, depths, poses, color_shape=(16, 16))
    return sens_path


def test_sens_reader_roundtrip(tmp_path):
    sens_path = _scene_sens(tmp_path)
    reader = SensReader(sens_path)
    assert reader.num_frames == 3
    frames = list(reader.frames(frame_skip=1, load_color=True))
    reader.close()
    assert len(frames) == 3
    assert frames[0].depth.shape == (16, 16)
    assert frames[0].color.shape == (16, 16, 3)
    assert frames[1].pose[0, 3] == pytest.approx(0.05)


def test_unproject_depth_geometry():
    depth = np.full((4, 4), 2000, np.uint16)  # 2 m everywhere
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 2.0
    intr[0, 2] = intr[1, 2] = 2.0
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 1.0
    coord, valid = unproject_depth(depth, intr, pose, depth_shift=1000.0)
    assert valid.all()
    np.testing.assert_allclose(coord[:, 2], 3.0)  # z = 2 m + 1 m offset
    # pixel (0,0): x = (0-2)/2*2 = -2
    np.testing.assert_allclose(coord[0, 0], -2.0)


def test_overlap_ratio_bounds():
    rng = np.random.default_rng(2)
    cloud = rng.uniform(0, 1, (200, 3)).astype(np.float32)
    assert overlap_ratio(cloud, cloud.copy(), 0.1) == pytest.approx(1.0)
    far = cloud + 100.0
    assert overlap_ratio(cloud, far, 0.1) == 0.0


def test_extract_scene_writes_pairs(tmp_path):
    sens_path = _scene_sens(tmp_path)
    out = os.path.join(str(tmp_path), "out")
    n = extract_scene(sens_path, out, frame_skip=1, voxel_size=0.2)
    assert n == 3
    overlap_file = os.path.join(out, "scene0001_00", "pcd", "overlap.txt")
    lines = open(overlap_file).read().strip().splitlines()
    assert len(lines) == 3  # C(3,2)
    rel, rel2, ratio = lines[0].split()
    frame = np.load(os.path.join(out, rel))
    assert frame["coord"].shape[1] == 3
    assert frame["color"].shape == frame["coord"].shape
    assert 0.0 <= float(ratio) <= 1.0
    # nearly-identical poses -> high overlap
    assert float(ratio) > 0.5


def test_bilinear_upsample_and_crop():
    feat = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
    up = bilinear_upsample(feat, 4, 4)
    assert up.shape == (4, 4, 2)
    np.testing.assert_allclose(up[0, 0], feat[0, 0])  # corners preserved
    np.testing.assert_allclose(up[-1, -1], feat[-1, -1])
    img = np.zeros((17, 19))
    assert center_crop(img, 1.0, 4).shape == (16, 16)


def test_grid_accumulator_mean():
    acc = GridAccumulator(grid_size=1.0)
    acc.add(np.array([[0.2, 0.2, 0.2]]), np.array([[1.0, 0.0]]))
    acc.add(np.array([[0.4, 0.4, 0.4], [5.0, 5.0, 5.0]]), np.array([[3.0, 0.0], [7.0, 7.0]]))
    coord, feat = acc.result()
    assert coord.shape == (2, 3)
    i = int(np.argmin(coord[:, 0]))
    np.testing.assert_allclose(np.asarray(feat, np.float32)[i], [2.0, 0.0])  # mean of 1 and 3


def test_lift_scene_with_fake_model(tmp_path):
    sens_path = _scene_sens(tmp_path)

    def feat_fn(color):
        h, w = color.shape[:2]
        out = np.zeros((h // 4, w // 4, 5), np.float32)
        out[..., 0] = 1.0
        return out

    feat_fn.patch_size = 4
    coord, feat = lift_scene(sens_path, feat_fn, frame_skip=1, grid_size=0.25, crop_ratio=1.0)
    assert coord.shape[0] > 0
    assert feat.shape == (coord.shape[0], 5)
    np.testing.assert_allclose(np.asarray(feat[:, 0], np.float32), 1.0, atol=1e-3)


def test_overlap_ratio_radius_semantics():
    """Matches use the reference's exact 1.5 * voxel_size radius: a point
    1.4 voxels away matches, 2.8 voxels away does not."""
    base = np.zeros((1, 3), np.float32)
    near = np.array([[1.4, 0, 0]], np.float32)  # 1.4 < 1.5 -> match
    far = np.array([[2.8, 0, 0]], np.float32)  # 2.8 > 1.5 -> no match
    assert overlap_ratio(base, near, 1.0) == pytest.approx(1.0)
    assert overlap_ratio(base, far, 1.0) == 0.0


def test_grid_accumulator_true_mean():
    """Every observation weighs equally regardless of arrival frame
    (the running-mean formulation biased toward recent frames)."""
    acc = GridAccumulator(grid_size=1.0)
    # frame 1: three points, feat 1.0, same voxel
    acc.add(np.full((3, 3), 0.2, np.float32), np.full((3, 4), 1.0, np.float32))
    # frame 2: one point, feat 5.0, same voxel
    acc.add(np.full((1, 3), 0.3, np.float32), np.full((1, 4), 5.0, np.float32))
    _, feat = acc.result()
    assert feat.shape == (1, 4)
    np.testing.assert_allclose(np.asarray(feat, np.float64), 2.0, rtol=1e-3)  # (3*1+5)/4
