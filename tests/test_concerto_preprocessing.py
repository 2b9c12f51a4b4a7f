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


def test_colmap_model_roundtrip(tmp_path):
    """COLMAP text model parse: world->cam quaternion rows invert to the
    constructed camera-to-world pose; PINHOLE params become the intrinsic."""
    import numpy as np

    from pointcept_keypointdetection_tpu.datasets.preprocessing.concerto import (
        load_colmap_model,
        quat_to_rotmat,
    )

    rng = np.random.default_rng(3)
    # a known c2w: rotation about z + translation
    th = 0.7
    R_c2w = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    t_c2w = np.array([1.0, -2.0, 0.5])
    R_w2c = R_c2w.T
    t_w2c = -R_w2c @ t_c2w
    # quaternion of R_w2c (rotation about -z by th)
    qw, qz = np.cos(th / 2), -np.sin(th / 2)
    np.testing.assert_allclose(quat_to_rotmat(qw, 0, 0, qz), R_w2c, atol=1e-12)

    (tmp_path / "cameras.txt").write_text(
        "# comment\n1 PINHOLE 640 480 500.0 510.0 320.0 240.0\n"
    )
    # a realistic long POINTS2D row (X Y POINT3D_ID triplets, >= 10 tokens
    # with parts[9] a pixel coordinate) must be skipped, not parsed as a frame
    pts2d = " ".join(f"{100.5 + i} {200.25 + i} -1" for i in range(6))
    (tmp_path / "images.txt").write_text(
        "# IMAGE_ID QW QX QY QZ TX TY TZ CAMERA_ID NAME\n"
        f"1 {qw} 0 0 {qz} {t_w2c[0]} {t_w2c[1]} {t_w2c[2]} 1 frame_000.jpg\n"
        f"{pts2d}\n"
    )

    model = load_colmap_model(str(tmp_path))
    assert list(model) == ["frame_000.jpg"]  # POINTS2D row not misparsed
    K, pose = model["frame_000.jpg"]
    np.testing.assert_allclose(K, [[500, 0, 320], [0, 510, 240], [0, 0, 1]])
    np.testing.assert_allclose(pose[:3, :3], R_c2w, atol=1e-9)
    np.testing.assert_allclose(pose[:3, 3], t_c2w, atol=1e-9)


def test_arkit_traj_and_pincam(tmp_path):
    import numpy as np

    from pointcept_keypointdetection_tpu.datasets.preprocessing.concerto import (
        axis_angle_to_rotmat,
        load_arkit_traj,
        load_pincam,
    )

    # axis-angle about x by 90deg, world->cam; camera at (0, 0, 2) in world
    r = np.array([np.pi / 2, 0.0, 0.0])
    R_w2c = axis_angle_to_rotmat(r)
    t_c2w = np.array([0.0, 0.0, 2.0])
    t_w2c = -R_w2c @ t_c2w
    (tmp_path / "lowres_wide.traj").write_text(
        f"12.3456 {r[0]} {r[1]} {r[2]} {t_w2c[0]} {t_w2c[1]} {t_w2c[2]}\n"
    )
    traj = load_arkit_traj(str(tmp_path / "lowres_wide.traj"))
    # nearest-timestamp lookup with ~1 ms tolerance (frame names and traj
    # rows are systematically off by ~1 ms in some ARKitScenes captures)
    pose = traj.nearest(12.345)
    assert pose is not None
    assert traj.nearest(12.400) is None  # beyond tolerance
    np.testing.assert_allclose(pose[:3, :3], R_w2c.T, atol=1e-9)
    np.testing.assert_allclose(pose[:3, 3], t_c2w, atol=1e-9)

    (tmp_path / "f.pincam").write_text("256 192 211.5 211.5 128.0 96.0\n")
    K = load_pincam(str(tmp_path / "f.pincam"))
    np.testing.assert_allclose(K, [[211.5, 0, 128], [0, 211.5, 96], [0, 0, 1]])


def test_process_scene_colmap_end_to_end(tmp_path):
    """A synthetic COLMAP scene exports images.npy + correspondence.npy with
    the in-view points mapped to their true pixels."""
    import numpy as np
    from PIL import Image

    from pointcept_keypointdetection_tpu.datasets.preprocessing.concerto import (
        process_scene_colmap,
    )

    rng = np.random.default_rng(0)
    coord = np.concatenate(
        [rng.uniform(-1, 1, (200, 2)), np.full((200, 1), 4.0)], axis=1
    )  # plane 4 m in front of an identity camera
    asset = tmp_path / "assets" / "scene0"
    asset.mkdir(parents=True)
    np.save(asset / "coord.npy", coord.astype(np.float32))

    scene = tmp_path / "scene0"
    (scene / "colmap").mkdir(parents=True)
    (scene / "undistorted_images").mkdir()
    (scene / "colmap" / "cameras.txt").write_text("1 PINHOLE 64 48 50 50 32 24\n")
    (scene / "colmap" / "images.txt").write_text("1 1 0 0 0 0 0 0 1 f0.jpg\n")
    Image.fromarray(np.zeros((48, 64, 3), np.uint8)).save(scene / "undistorted_images" / "f0.jpg")

    v = process_scene_colmap(str(scene), str(asset), frame_gap=1, max_images=4)
    assert v == 1
    corr = np.load(asset / "correspondence.npy")
    assert corr.shape == (200, 1, 2)
    vis = corr[:, 0, 0] >= 0
    assert vis.sum() > 50
    # check one visible point's pixel against the projection formula
    i = int(np.argmax(vis))
    x, y = corr[i, 0]
    assert abs(x - (coord[i, 0] / 4.0 * 50 + 32)) <= 1
    assert abs(y - (coord[i, 1] / 4.0 * 50 + 24)) <= 1
