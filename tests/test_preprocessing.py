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


def test_chunking(tmp_path, rng):
    from pointcept_keypointdetection_tpu.datasets.preprocessing.chunking import chunking_scene

    scene = tmp_path / "train" / "sceneX"
    scene.mkdir(parents=True)
    coord = rng.uniform(0, 12, (30000, 3)).astype(np.float32)
    seg = rng.integers(0, 5, 30000).astype(np.int32)
    np.save(scene / "coord.npy", coord)
    np.save(scene / "segment.npy", seg)
    n = chunking_scene("sceneX", str(tmp_path), "train", chunk_range=(6, 6),
                       chunk_stride=(3, 3), chunk_minimum_size=100)
    assert n > 1
    out_split = tmp_path / "train_chunk6x6_stride3x3"
    chunks = sorted(out_split.iterdir())
    assert len(chunks) == n
    c0 = np.load(chunks[0] / "coord.npy")
    s0 = np.load(chunks[0] / "segment.npy")
    assert len(c0) == len(s0) >= 100
    # chunk fits its BEV tile (after min-shift)
    shifted = coord - coord.min(0)
    assert c0.shape[1] == 3


def _write_mesh_ply(path, coord, color, faces):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(coord)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for c, col in zip(coord, color):
            f.write(f"{c[0]} {c[1]} {c[2]} {col[0]} {col[1]} {col[2]}\n")
        for face in faces:
            f.write("3 " + " ".join(str(v) for v in face) + "\n")


def test_scannetpp_preprocess(tmp_path, rng):
    import json

    from pointcept_keypointdetection_tpu.datasets.preprocessing.scannetpp import main as pp_main
    import sys

    n = 60
    coord = rng.uniform(0, 2, (n, 3)).astype(np.float32)
    color = rng.integers(0, 255, (n, 3)).astype(np.uint8)
    faces = np.stack([np.arange(n - 2), np.arange(1, n - 1), np.arange(2, n)], 1)
    root = tmp_path / "spp"
    scans = root / "data" / "sc0" / "scans"
    scans.mkdir(parents=True)
    _write_mesh_ply(scans / "mesh_aligned_0.05.ply", coord, color, faces)
    # every vertex its own segment; two instances covering halves
    json.dump({"segIndices": list(range(n))}, open(scans / "segments.json", "w"))
    json.dump(
        {"segGroups": [
            {"label": "wall", "objectId": 1, "segments": list(range(n // 2))},
            {"label": "sofa chair", "objectId": 2, "segments": list(range(n // 2, n))},
        ]},
        open(scans / "segments_anno.json", "w"),
    )
    (root / "splits").mkdir()
    (root / "splits" / "nvs_sem_train.txt").write_text("sc0\n")
    (root / "splits" / "nvs_sem_val.txt").write_text("")
    (root / "splits" / "sem_test.txt").write_text("")
    meta = root / "metadata" / "semantic_benchmark"
    meta.mkdir(parents=True)
    (meta / "top100.txt").write_text("wall\nchair\n")
    (meta / "map_benchmark.csv").write_text(
        "class,semantic_map_to,instance_map_to\nwall,,\nsofa chair,chair,chair\n"
    )

    out = tmp_path / "out"
    argv = sys.argv
    sys.argv = ["x", "--dataset_root", str(root), "--output_root", str(out), "--num_workers", "1"]
    try:
        pp_main()
    finally:
        sys.argv = argv

    scene_out = out / "train" / "sc0"
    seg = np.load(scene_out / "segment.npy")
    inst = np.load(scene_out / "instance.npy")
    normal = np.load(scene_out / "normal.npy")
    assert seg.shape == (n, 3) and inst.shape == (n, 3)
    assert (seg[: n // 2, 0] == 0).all()  # wall -> class 0
    assert (seg[n // 2 :, 0] == 1).all()  # sofa chair -> chair -> class 1
    assert (inst[: n // 2, 0] == 1).all() and (inst[n // 2 :, 0] == 2).all()
    np.testing.assert_allclose(np.linalg.norm(normal, axis=1), 1.0, atol=1e-5)


def test_matterport3d_region(tmp_path, rng):
    """Region PLY with per-face category_id -> vertex-majority segment."""
    from pointcept_keypointdetection_tpu.datasets.preprocessing.matterport3d import (
        MATTERPORT_CLASS_REMAP,
        handle_region,
    )

    n = 30
    coord = rng.normal(size=(n, 3)).astype(np.float32)
    color = rng.integers(0, 255, (n, 3))
    faces = np.stack([np.arange(n - 2), np.arange(1, n - 1), np.arange(2, n)], 1)
    # raw category 5 -> nyu40 2 (floor), raw 7 -> nyu40 40 (otherfurn)
    cat = np.where(np.arange(len(faces)) < len(faces) // 2, 5, 7)
    scans = tmp_path / "v1" / "scans" / "SCENE1" / "region_segmentations"
    scans.mkdir(parents=True)
    ply_path = scans / "region0.ply"
    with open(ply_path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nproperty int category_id\nend_header\n")
        for c, col in zip(coord, color):
            f.write(f"{c[0]} {c[1]} {c[2]} {col[0]} {col[1]} {col[2]}\n")
        for face, cid in zip(faces, cat):
            f.write("3 " + " ".join(str(v) for v in face) + f" {cid}\n")

    mapping = np.zeros(10, np.int64)
    mapping[5] = 2   # raw 5 -> nyu floor
    mapping[7] = 40  # raw 7 -> nyu otherfurniture (allowed? 39 is; 40 is NOT)
    out = tmp_path / "out"
    handle_region(str(ply_path), str(out), mapping, {"SCENE1"}, set())
    seg = np.load(out / "train" / "SCENE1_region0.npy".replace(".npy", "") / "segment.npy")
    assert seg.shape == (n,)
    # first vertices voted floor (nyu 2 -> remap 2 -> saved 1 after the -1 shift)
    assert seg[0] == MATTERPORT_CLASS_REMAP[2] - 1
    # nyu 40 not in the allowed list -> unlabeled (-1) for the tail vertices
    assert seg[-1] == -1


def test_structured3d_scene(tmp_path, rng):
    """Tiny zipped pano room -> fused npy scene with 25-class labels."""
    import io
    import zipfile

    import cv2
    from PIL import Image

    from pointcept_keypointdetection_tpu.datasets.preprocessing.structured3d import parse_scene

    h, w = 16, 32
    depth = np.full((h, w), 2000, np.uint16)  # 2 m everywhere
    rgb = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    semantic = np.full((h, w), 2, np.uint8)  # floor (nyu 2 -> class idx 1)

    zpath = tmp_path / "Structured3D_00.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        base = "Structured3D/scene_00001/2D_rendering/0/panorama"
        z.writestr(f"{base}/camera_xyz.txt", "0 0 1600")
        ok, dbuf = cv2.imencode(".png", depth)
        assert ok
        z.writestr(f"{base}/full/depth.png", dbuf.tobytes())
        ok, cbuf = cv2.imencode(".png", rgb[..., ::-1])
        z.writestr(f"{base}/full/rgb_rawlight.png", cbuf.tobytes())
        sbuf = io.BytesIO()
        Image.fromarray(semantic).save(sbuf, format="PNG")
        z.writestr(f"{base}/full/semantic.png", sbuf.getvalue())

    out = tmp_path / "out"
    parse_scene("scene_00001", str(tmp_path), str(out), fuse_prsp=False, fuse_pano=True)
    scene_dir = out / "train" / "scene_00001_room_0"
    coord = np.load(scene_dir / "coord.npy")
    seg = np.load(scene_dir / "segment.npy")
    assert len(coord) > 100
    assert (seg == 1).all()  # nyu 2 = floor -> index 1 in the 25-class list
    # points lie ~2 m from the (swapped-axis) camera center
    cam = np.array([0, 1.6, 0]) @ np.array([[1, 0, 0], [0, 0, 1], [0, 1, 0]])
    d = np.linalg.norm(coord - cam, axis=1)
    np.testing.assert_allclose(d, 2.0, atol=0.1)


def test_arkitscenes_mesh(tmp_path, rng):
    from pointcept_keypointdetection_tpu.datasets.preprocessing.arkitscenes import parse_scene

    n = 40
    coord = rng.normal(size=(n, 3)).astype(np.float32)
    color = rng.integers(0, 255, (n, 3))
    faces = np.stack([np.arange(n - 2), np.arange(1, n - 1), np.arange(2, n)], 1)
    scene = tmp_path / "3dod" / "Training" / "41048190"
    scene.mkdir(parents=True)
    _write_mesh_ply(scene / "41048190_3dod_mesh.ply", coord, color, faces)
    out = tmp_path / "out"
    parse_scene(str(scene / "41048190_3dod_mesh.ply"), str(out))
    normal = np.load(out / "Training" / "41048190" / "normal.npy")
    np.testing.assert_allclose(np.linalg.norm(normal, axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.load(out / "Training" / "41048190" / "coord.npy"), coord, rtol=1e-6)


def test_data_efficient_split_generator(tmp_path, rng, monkeypatch):
    """tools/generate_data_efficient_splits.py makes the efficient-* config
    assets (LA points{K}.npy + LR scene{P}.txt) from a scannet-layout tree,
    instance-stratified; ScanNetDataset consumes them end-to-end (masking
    everything outside the sample to ignore_index)."""
    import subprocess
    import sys as _sys

    root = tmp_path / "scannet"
    names = ["scene0000_00", "scene0001_00", "scene0002_00", "scene0003_00"]
    for si, name in enumerate(names):
        d = root / "train" / name
        d.mkdir(parents=True)
        n = 500
        coord = rng.uniform(0, 4, (n, 3)).astype(np.float32)
        seg = rng.integers(0, 5, n).astype(np.int64)
        seg[:20] = -1  # some unlabeled points
        inst = rng.integers(0, 7, n).astype(np.int64)
        np.save(d / "coord.npy", coord)
        np.save(d / "color.npy", rng.integers(0, 255, (n, 3)).astype(np.uint8))
        np.save(d / "normal.npy", rng.normal(size=(n, 3)).astype(np.float32))
        np.save(d / "segment20.npy", seg)
        np.save(d / "instance.npy", inst)
    (root / "val").mkdir()

    script = os.path.join(os.path.dirname(__file__), "..", "tools", "generate_data_efficient_splits.py")
    subprocess.run(
        [_sys.executable, script, "--data-root", str(root), "--points", "20", "--scenes", "50"],
        check=True,
    )

    la = np.load(root / "tasks" / "points" / "points20.npy", allow_pickle=True).item()
    assert set(la) == set(names)
    for name in names:
        idx = la[name]
        assert len(idx) == 20 and len(np.unique(idx)) == 20
        seg = np.load(root / "train" / name / "segment20.npy")
        inst = np.load(root / "train" / name / "instance.npy")
        assert (seg[idx] >= 0).all()  # only labeled points sampled
        # instance-stratified: 20 picks over 7 instances cover every instance
        assert len(np.unique(inst[idx])) == len(np.unique(inst[seg >= 0]))

    lr = np.loadtxt(root / "tasks" / "scenes" / "scene50.txt", dtype=str)
    assert len(np.atleast_1d(lr)) == 2  # 50% of 4 scenes

    from pointcept_keypointdetection_tpu.datasets import build_dataset

    ds = build_dataset(dict(
        type="ScanNetDataset", split="train", data_root=str(root),
        la_file=str(root / "tasks" / "points" / "points20.npy"),
        transform=[], test_mode=False, loop=1,
    ))
    sample = ds.get_data(0)
    seg = sample["segment"]
    assert (seg >= 0).sum() == 20  # everything outside the sample is ignored
    assert len(sample["sampled_index"]) == 20

    ds_lr = build_dataset(dict(
        type="ScanNetDataset", split="train", data_root=str(root),
        lr_file=str(root / "tasks" / "scenes" / "scene50.txt"),
        transform=[], test_mode=False, loop=1,
    ))
    assert len(ds_lr.get_data_list()) == 2


def test_re10k_ground_alignment_and_fusion(tmp_path, rng):
    """re10k preprocessing: posed-depth fusion -> ground-plane RANSAC z-up
    alignment -> Concerto layout (reference preprocess_re10k.py contract,
    VGGT replaced by the exported-prediction data contract)."""
    from PIL import Image

    from pointcept_keypointdetection_tpu.datasets.preprocessing.re10k import (
        align_ground_plane,
        process_scene,
    )

    # --- align_ground_plane: tilted ground + wall clutter ---------------
    n = 4000
    ground = np.stack(
        [rng.uniform(-5, 5, n), rng.uniform(-5, 5, n), rng.normal(0, 0.005, n)], 1
    )
    wall = np.stack(
        [rng.uniform(-5, 5, n // 4), np.full(n // 4, 4.0), rng.uniform(0, 3, n // 4)], 1
    )
    pts = np.concatenate([ground, wall]).astype(np.float32)
    th = np.deg2rad(15)
    R_true = np.array(
        [[1, 0, 0], [0, np.cos(th), -np.sin(th)], [0, np.sin(th), np.cos(th)]], np.float32
    )
    tilted = pts @ R_true.T + np.array([0, 0, 2.0], np.float32)
    R, z_off = align_ground_plane(tilted)
    fixed = tilted @ R.T
    fixed[:, 2] -= z_off
    assert abs(np.median(fixed[:n, 2])) < 0.02  # ground back at z=0
    spread = np.std(fixed[:n, 2])
    assert spread < 0.02  # and flat again (rotation recovered)

    # --- full scene: camera at origin looking +z at a wall 3 m away ----
    scene = tmp_path / "scene_a"
    for sub in ("color", "depth", "pose", "intrinsic"):
        (scene / sub).mkdir(parents=True)
    h = w = 64
    K = np.array([[64, 0, 32], [0, 64, 32], [0, 0, 1]], np.float64)
    np.save(scene / "intrinsic" / "intrinsic.npy", K)
    for fid in ("0", "1"):
        depth = np.full((h, w), 3.0, np.float32) + rng.normal(0, 0.002, (h, w)).astype(np.float32)
        np.save(scene / "depth" / f"{fid}.npy", depth)
        Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8)).save(
            scene / "color" / f"{fid}.png"
        )
        np.save(scene / "pose" / f"{fid}.npy", np.eye(4))
    out = process_scene(str(scene), str(tmp_path / "out"), grid_size=0.05, max_images=2)
    coord = np.load(os.path.join(out, "coord.npy"))
    assert len(coord) > 500
    # the viewed plane (perpendicular to z) is the "ground": aligned to z~0
    assert np.abs(coord[:, 2]).mean() < 0.05
    assert os.path.exists(os.path.join(out, "images.npy"))
    assert os.path.exists(os.path.join(out, "correspondence.npy"))
