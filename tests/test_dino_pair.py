"""ScanNetPair dataset, AEO label remap, and DINO-enhanced segmentor/tester."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from pointcept_keypointdetection_tpu.datasets import DATASETS, collate
from pointcept_keypointdetection_tpu.models import MODELS, PointBatch


def _write_pair_scene(root, scene="scene0000_00", n_frames=3):
    pcd_dir = os.path.join(root, scene, "pcd")
    os.makedirs(pcd_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    names = []
    # frames overlap on a shared 30-point surface patch (registered scans)
    shared = rng.uniform(0, 2, (30, 3)).astype(np.float32)
    for i in range(n_frames):
        coord = np.concatenate(
            [shared, rng.uniform(0, 2, (20 + i, 3))], axis=0
        ).astype(np.float32)
        color = rng.uniform(0, 255, (50 + i, 3)).astype(np.float32)
        name = os.path.join(scene, "pcd", f"{i}.npz")
        np.savez(os.path.join(root, name), coord=coord, color=color)
        names.append(name)
    with open(os.path.join(pcd_dir, "overlap.txt"), "w") as f:
        f.write(f"{names[0]} {names[1]} 0.9\n")
        f.write(f"{names[0]} {names[2]} 0.1\n")  # below threshold -> dropped
        f.write(f"{names[1]} {names[2]} 0.5\n")
    return names


def test_scannet_pair_dataset(tmp_path):
    root = str(tmp_path)
    _write_pair_scene(root)
    ds = DATASETS.build(
        dict(
            type="ScanNetPairDataset",
            data_root=root,
            overlap_threshold=0.3,
            view1_transform=[dict(type="CenterShift", apply_z=True)],
            view2_transform=[dict(type="CenterShift", apply_z=True)],
            loop=2,
        )
    )
    assert len(ds) == 4  # 2 pairs x loop 2
    sample = ds[0]
    assert "view1_coord" in sample and "view2_coord" in sample
    # MSC view contract: feat/grid_coord/origin per view
    for i in (1, 2):
        assert sample[f"view{i}_feat"].shape[0] == sample[f"view{i}_coord"].shape[0]
        assert sample[f"view{i}_origin"].dtype == np.int64
    # cross-view correspondence: frames of one registered scene share
    # world-voxel origin ids exactly where they overlap
    common = set(sample["view1_origin"]) & set(sample["view2_origin"])
    assert len(common) >= 25  # the 30 shared points (minus voxel merges)
    batch = collate([sample], slot_size=64)
    assert batch["view1_coord"].shape == (64, 3)
    assert batch["view1_valid"].sum() == 50
    assert batch["view2_valid"].sum() == 51


def test_aeo_label_remap(tmp_path):
    scene = os.path.join(str(tmp_path), "train", "sceneA")
    os.makedirs(scene)
    np.save(os.path.join(scene, "coord.npy"), np.zeros((5, 3), np.float32))
    np.save(os.path.join(scene, "segment.npy"), np.array([0, 1, 2, 40, 39], np.int16))
    ds = DATASETS.build(dict(type="AEODataset", data_root=str(tmp_path), split="train"))
    seg = ds.get_data(0)["segment"]
    np.testing.assert_array_equal(seg, [0, 1, -1, -1, 15])


def _point(rng, B=1, S=64, C=3):
    coords = rng.uniform(0, 0.8, (B, S, 3)).astype(np.float32)
    grid = np.floor(coords / 0.05).astype(np.int32)
    valid = np.ones((B, S), bool)
    valid[:, -4:] = False
    feat = rng.normal(size=(B, S, C)).astype(np.float32)
    return PointBatch(
        coord=jnp.asarray(coords.reshape(-1, 3)),
        feat=jnp.asarray(feat.reshape(-1, C)),
        grid_coord=jnp.asarray(grid.reshape(-1, 3)),
        valid=jnp.asarray(valid.reshape(-1)),
        num_samples=B,
    )


def test_dino_enhanced_segmentor(rng):
    model = MODELS.build(
        dict(
            type="DINOEnhancedSegmentor",
            num_classes=5,
            backbone_out_channels=8,
            backbone=dict(
                type="SpUNet-v1m1",
                in_channels=3,
                num_classes=0,
                base_channels=8,
                channels=(8, 16, 16, 16, 16, 16, 8, 8),
                layers=(1, 1, 1, 1, 1, 1, 1, 1),
                stem_kernel=3,
            ),
            criteria=[dict(type="CrossEntropyLoss")],
            freeze_backbone=True,
        )
    )
    point = _point(rng)
    m = 32
    batch = {
        "dino_coord": jnp.asarray(rng.uniform(0, 0.8, (m, 3)).astype(np.float32)),
        "dino_feat": jnp.asarray(rng.normal(size=(m, 16)).astype(np.float32)),
        "dino_valid": jnp.ones(m, bool),
        "segment": jnp.asarray(rng.integers(0, 5, 64).astype(np.int32)),
    }
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, point, batch
    )
    out = model.apply(variables, point, batch, train=False)
    assert out["seg_logits"].shape == (64, 5)
    assert np.isfinite(float(out["loss"]))

    # frozen backbone: grads w.r.t. backbone params must be zero
    def loss_fn(params):
        o = model.apply({**variables, "params": params}, point, batch, train=True)
        return o["loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    for path, g in flat:
        name = jax.tree_util.keystr(path)
        if "seg_head" not in name:
            assert float(jnp.abs(g).max()) == 0.0, name


def test_dino_enhanced_segmentor_no_backbone(rng):
    model = MODELS.build(
        dict(
            type="DINOEnhancedSegmentor",
            num_classes=4,
            backbone=None,
            criteria=[dict(type="CrossEntropyLoss")],
        )
    )
    point = _point(rng)
    m = 16
    batch = {
        "dino_coord": jnp.asarray(rng.uniform(0, 0.8, (m, 3)).astype(np.float32)),
        "dino_feat": jnp.asarray(rng.normal(size=(m, 8)).astype(np.float32)),
        "dino_valid": jnp.ones(m, bool),
        "segment": jnp.asarray(rng.integers(0, 4, 64).astype(np.int32)),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, point, batch, train=False)
    out = model.apply(variables, point, batch, train=False)
    assert out["seg_logits"].shape == (64, 4)


def test_dino_knn_uses_origin_coord(rng):
    """Augmented point coords must NOT change the DINO match when the
    unaugmented origin_coord is provided (reference knns on origin_coord)."""
    model = MODELS.build(
        dict(
            type="DINOEnhancedSegmentor",
            num_classes=4,
            backbone=None,
            criteria=[],
        )
    )
    point = _point(rng)
    m = 16
    dino = {
        "dino_coord": jnp.asarray(rng.uniform(0, 0.8, (m, 3)).astype(np.float32)),
        "dino_feat": jnp.asarray(rng.normal(size=(m, 8)).astype(np.float32)),
        "dino_valid": jnp.ones(m, bool),
    }
    origin = point.coord  # world frame
    # simulate augmentation: rotate/shift the live coords
    aug_point = point.replace(coord=point.coord * 1.3 + 5.0)

    batch_origin = dict(dino, origin_coord=origin)
    v = model.init({"params": jax.random.PRNGKey(0)}, point, batch_origin, train=False)
    out_ref = model.apply(v, point, batch_origin, train=False)
    out_aug = model.apply(v, aug_point, batch_origin, train=False)
    # with origin_coord present, augmentation of live coords is irrelevant
    np.testing.assert_allclose(
        np.asarray(out_ref["seg_logits"]), np.asarray(out_aug["seg_logits"]), rtol=1e-5
    )
    # without origin_coord, the fallback uses live coords -> different match
    out_fallback = model.apply(v, aug_point, dict(dino), train=False)
    assert not np.allclose(
        np.asarray(out_ref["seg_logits"]), np.asarray(out_fallback["seg_logits"])
    )
