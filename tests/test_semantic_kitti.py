"""SemanticKITTI dataset readers on a synthetic raw-KITTI layout."""

import os

import numpy as np
import pytest

from pointcept_keypointdetection_tpu.datasets.builder import DATASETS
from pointcept_keypointdetection_tpu.datasets.semantic_kitti import (
    LEARNING_MAP,
    parse_calib_file,
    project_lidar_to_image,
)


def make_kitti(tmp_path, seq="08", n_frames=2, n_pts=120, with_images=False):
    rng = np.random.default_rng(0)
    seq_dir = tmp_path / "dataset" / "sequences" / seq
    (seq_dir / "velodyne").mkdir(parents=True)
    (seq_dir / "labels").mkdir()
    raw_ids = [k for k, v in LEARNING_MAP.items() if v >= 0]
    for i in range(n_frames):
        scan = rng.uniform(-20, 20, (n_pts, 4)).astype(np.float32)
        scan[:, 2] = rng.uniform(-2, 1, n_pts)
        scan.tofile(seq_dir / "velodyne" / f"{i:06d}.bin")
        labels = rng.choice(raw_ids, n_pts).astype(np.uint32)
        labels.tofile(seq_dir / "labels" / f"{i:06d}.label")
    if with_images:
        from PIL import Image

        (seq_dir / "image_2").mkdir()
        (seq_dir / "image_3").mkdir()
        for i in range(n_frames):
            for cam in (2, 3):
                img = Image.fromarray(rng.integers(0, 255, (370, 1226, 3), dtype=np.uint8))
                img.save(seq_dir / f"image_{cam}" / f"{i:06d}.png")
        # P2/P3: a plausible KITTI pinhole; Tr: velodyne->cam rotation
        P = "7.070912e+02 0 6.018873e+02 0 0 7.070912e+02 1.831104e+02 0 0 0 1 0"
        Tr = "0 -1 0 0 0 0 -1 0 1 0 0 0"
        (seq_dir / "calib.txt").write_text(
            f"P0: {P}\nP1: {P}\nP2: {P}\nP3: {P}\nTr: {Tr}\n"
        )
    return tmp_path


def test_kitti_color_normal(tmp_path):
    make_kitti(tmp_path)
    ds = DATASETS.build(
        dict(type="SemanticKITTIColorNormalDataset", split="val", data_root=str(tmp_path), transform=None)
    )
    d = ds.get_data(0)
    assert d["normal"].shape == d["coord"].shape
    np.testing.assert_allclose(np.linalg.norm(d["normal"], axis=1), 1.0, rtol=1e-5)
    assert d["color"].shape == d["coord"].shape
    assert d["segment"].min() >= 0  # learning-mapped


def test_kitti_image_point(tmp_path):
    make_kitti(tmp_path, with_images=True)
    ds = DATASETS.build(
        dict(
            type="SemanticKITTIImagePointDataset",
            split="val",
            data_root=str(tmp_path),
            transform=None,
            patch_size=14,
            patch_h=8,
            patch_w=16,
        )
    )
    d = ds.get_data(0)
    n = d["coord"].shape[0]
    assert d["images"].shape == (2, 3, 8 * 14, 16 * 14)
    assert d["img_valid"].all()
    assert d["correspondence"].shape == (n, 2, 2)
    hit = (d["correspondence"][:, 0, 0] >= 0)
    assert hit.any(), "some points must project into image_2"
    # hit points got painted from the image (non-zero color somewhere)
    assert np.abs(d["color"][hit]).sum() > 0
    # projection math: in-front points only
    calib = parse_calib_file(os.path.join(str(tmp_path), "dataset", "sequences", "08", "calib.txt"))
    uv, mask = project_lidar_to_image(d["coord"], (370, 1226), calib["P2"], calib["Tr"])
    cam_z = (calib["Tr"] @ np.concatenate([d["coord"], np.ones((n, 1))], 1).T).T[:, 2]
    assert (cam_z[mask] > 0).all()
    assert (uv[mask] >= 0).all()
