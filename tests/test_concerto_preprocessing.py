"""Tests for Concerto image-point correspondence preprocessing.

Parity surface: reference `pointcept/datasets/preprocessing/concerto/*` —
per-scene ``images.npy`` + per-point pixel ``correspondence.npy`` consumed by
``ImagePointDataset``.
"""

import os

import numpy as np
import pytest

from pointcept_keypointdetection_tpu.datasets.preprocessing.concerto import (
    process_scene_dirs,
    project_points,
    select_views,
    splat_depth_buffer,
)


def _cam_setup():
    # camera at origin looking down +z, 100x100 image, f=50, c=(50,50)
    intrinsic = np.array([[50.0, 0, 50.0], [0, 50.0, 50.0], [0, 0, 1]])
    pose = np.eye(4)
    return intrinsic, pose


def test_project_points_basic():
    intrinsic, pose = _cam_setup()
    coord = np.array(
        [
            [0.0, 0.0, 2.0],  # center pixel (50, 50)
            [1.0, 0.0, 2.0],  # x=1,z=2 -> u = 50*0.5+50 = 75
            [0.0, 0.0, -1.0],  # behind camera
            [10.0, 0.0, 2.0],  # out of frame
        ]
    )
    corr = project_points(coord, intrinsic, pose, (100, 100))
    assert corr.shape == (4, 2)
    assert tuple(corr[0]) == (50, 50)
    assert tuple(corr[1]) == (75, 50)
    assert tuple(corr[2]) == (-1, -1)
    assert tuple(corr[3]) == (-1, -1)


def test_project_points_depth_occlusion():
    intrinsic, pose = _cam_setup()
    # two points on the same ray; depth buffer stores the near one (z=2)
    coord = np.array([[0.0, 0.0, 2.0], [0.0, 0.0, 4.0]])
    depth = np.zeros((100, 100), np.float32)
    depth[50, 50] = 2000.0  # millimeters with depth_shift=1000
    corr = project_points(coord, intrinsic, pose, (100, 100), depth=depth)
    assert tuple(corr[0]) == (50, 50)
    assert tuple(corr[1]) == (-1, -1)  # occluded


def test_project_points_bad_pose():
    intrinsic, _ = _cam_setup()
    pose = np.full((4, 4), np.nan)
    corr = project_points(np.zeros((3, 3)), intrinsic, pose, (10, 10))
    assert (corr == -1).all()


def test_splat_depth_buffer_occludes_far_point():
    intrinsic, pose = _cam_setup()
    coord = np.array([[0.0, 0.0, 2.0], [0.0, 0.0, 4.0]])
    buf = splat_depth_buffer(coord, intrinsic, pose, (100, 100), downscale=4)
    assert buf.shape == (25, 25)
    # cell holding the ray keeps the minimum depth
    assert buf[12, 12] == pytest.approx(2.0)
    corr = project_points(
        coord, intrinsic, pose, (100, 100), depth=buf, depth_shift=1.0
    )
    assert tuple(corr[0]) == (50, 50)
    assert tuple(corr[1]) == (-1, -1)


def test_select_views():
    assert list(select_views([5, 1], 4)) == [0, 1]
    # picks the 2 highest-count views, order-preserving
    assert list(select_views([1, 9, 3, 7], 2)) == [1, 3]


def test_process_scene_dirs_end_to_end(tmp_path):
    pil = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(0)
    coord = rng.uniform(-1, 1, (200, 3))
    coord[:, 2] += 3.0  # in front of the camera

    asset_dir = tmp_path / "assets" / "train" / "scene0"
    os.makedirs(asset_dir)
    np.save(asset_dir / "coord.npy", coord)

    scene_dir = tmp_path / "raw" / "scene0"
    for sub in ("color", "pose", "intrinsic"):
        os.makedirs(scene_dir / sub)
    intrinsic, _ = _cam_setup()
    np.save(scene_dir / "intrinsic" / "intrinsic.npy", intrinsic)
    for fid in range(3):
        img = pil.fromarray(
            rng.integers(0, 255, (100, 100, 3), dtype=np.uint8), "RGB"
        )
        img.save(scene_dir / "color" / f"{fid}.jpg")
        pose = np.eye(4)
        pose[0, 3] = 0.1 * fid  # slight translation per frame
        np.save(scene_dir / "pose" / f"{fid}.npy", pose)

    views = process_scene_dirs(str(scene_dir), str(asset_dir), max_images=2)
    assert views == 2
    images = np.load(asset_dir / "images.npy")
    corr = np.load(asset_dir / "correspondence.npy")
    assert images.shape == (2, 100, 100, 3)
    assert corr.shape == (200, 2, 2)
    # a healthy fraction of points is visible (the splat depth buffer
    # occludes the back of the volume behind nearer points in the same cell)
    vis = (corr[:, :, 0] >= 0).mean()
    assert vis > 0.2
    # the nearest slab of the volume is essentially all visible
    near = coord[:, 2] < np.quantile(coord[:, 2], 0.1)
    assert (corr[near, :, 0] >= 0).mean() > 0.7
    # visible pixel coords are in range
    ok = corr[:, :, 0] >= 0
    assert (corr[ok] >= 0).all() and (corr[ok] < 100).all()
