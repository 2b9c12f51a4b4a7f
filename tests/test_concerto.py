"""Concerto 2D-3D SSL: MultiViewGenerator, ImagePointDataset, model forward."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcept_keypointdetection_tpu.datasets.collate import collate, pad_sample
from pointcept_keypointdetection_tpu.datasets.transform import TRANSFORMS
from pointcept_keypointdetection_tpu.engines.common import build_point_batch
from pointcept_keypointdetection_tpu.models import MODELS

PH = PW = 4  # patch grid
PS = 8  # patch size
V = 2  # image views


def _scene(rng, n=500):
    coord = rng.uniform(0, 2.0, (n, 3)).astype(np.float32)
    color = rng.uniform(0, 255, (n, 3)).astype(np.float32)
    corr = np.full((n, V, 2), -1, np.int32)
    sel = rng.random((n, V)) < 0.5
    corr[..., 0] = np.where(sel, rng.integers(0, PH, (n, V)), -1)
    corr[..., 1] = np.where(sel, rng.integers(0, PW, (n, V)), -1)
    images = rng.random((V, 3, PH * PS, PW * PS)).astype(np.float32)
    return dict(coord=coord, color=color, correspondence=corr, images=images,
                img_valid=np.ones(V, bool))


def _mvg():
    return TRANSFORMS.build(
        dict(
            type="MultiViewGenerator",
            global_view_num=2,
            local_view_num=2,
            view_keys=("coord", "color"),
            global_transform=[dict(type="GridSample", grid_size=0.05, hash_type="fnv",
                                   mode="train", return_grid_coord=True)],
            local_transform=[dict(type="GridSample", grid_size=0.05, hash_type="fnv",
                                  mode="train", return_grid_coord=True)],
            global_slot=256,
            local_slot=64,
        )
    )


def test_multi_view_generator_shapes(rng):
    out = _mvg()(_scene(rng))
    for i in (1, 2):
        assert out[f"global{i}_coord"].shape == (256, 3)
        assert out[f"global{i}_feat"].shape[0] == 256
        assert out[f"global{i}_valid"].sum() > 0
        assert out[f"global{i}_origin"].shape == (256,)
    for j in (1, 2):
        assert out[f"local{j}_coord"].shape == (64, 3)
    assert out["global1_correspondence"].shape == (256, V, 2)
    # origins index into the source cloud; padded rows are -1
    g1v = out["global1_valid"]
    assert (out["global1_origin"][g1v] >= 0).all()
    assert (out["global1_origin"][~g1v] == -1).all()
    # local views are subsets of the cloud; feat carries color
    assert out["local1_feat"].shape[1] == 3


def test_multi_view_collate(rng):
    samples = [_mvg()(_scene(rng)) for _ in range(2)]
    batch = collate([pad_sample(s, 256) for s in samples], 256)
    assert batch["global1_coord"].shape == (512, 3)
    assert batch["local2_coord"].shape == (128, 3)
    assert batch["images"].shape == (2, V, 3, PH * PS, PW * PS)


def test_image_point_dataset(tmp_path, rng):
    from pointcept_keypointdetection_tpu.datasets.builder import DATASETS

    scene = tmp_path / "train" / "scene0"
    scene.mkdir(parents=True)
    n = 100
    np.save(scene / "coord.npy", rng.uniform(0, 2, (n, 3)).astype(np.float32))
    np.save(scene / "color.npy", rng.uniform(0, 255, (n, 3)).astype(np.float32))
    h0, w0 = 40, 40
    np.save(scene / "images.npy", (rng.random((3, h0, w0, 3)) * 255).astype(np.uint8))
    corr = np.stack(
        [rng.integers(0, w0, (n, 3)), rng.integers(0, h0, (n, 3))], axis=-1
    ).astype(np.int32)
    np.save(scene / "correspondence.npy", corr)

    ds = DATASETS.build(
        dict(
            type="ImagePointDataset",
            data_root=str(tmp_path),
            split="train",
            crop_h=PH * PS,
            crop_w=PW * PS,
            patch_size=PS,
            max_images=4,
            transform=[],
        )
    )
    d = ds[0]
    assert d["images"].shape == (4, 3, PH * PS, PW * PS)
    assert d["img_valid"].tolist() == [True, True, True, False]
    assert d["correspondence"].shape == (n, 4, 2)
    ok = d["correspondence"][..., 0] >= 0
    assert ok.any()
    assert d["correspondence"][..., 0].max() < PH
    assert d["correspondence"][..., 1].max() < PW


def _concerto_batch(rng, b=1, slot=256):
    samples = [_mvg()(_scene(rng)) for _ in range(b)]
    batch_np = collate([pad_sample(s, slot) for s in samples], slot)
    return {
        k: jnp.asarray(v) for k, v in batch_np.items() if not isinstance(v, (list, int))
    }


def test_concerto_forward_and_grads(rng):
    batch = _concerto_batch(rng)
    point = build_point_batch(batch, 1)
    model = MODELS.build(
        dict(
            type="Concerto-v1m1",
            backbone=dict(
                type="SpUNet-v1m1", in_channels=3, num_classes=0, base_channels=8,
                channels=(8, 16, 16, 16, 16, 16, 8, 8), layers=(1,) * 8, stem_kernel=3,
            ),
            backbone_in_channels=3,
            num_global_view=2,
            num_local_view=2,
            head_hidden_channels=32,
            head_embed_channels=16,
            head_num_prototypes=32,
            enc2d_embed_channels=16,
            enc2d_depth=1,
            enc2d_num_heads=2,
            patch_size=PS,
            patch_h=PH,
            patch_w=PW,
            num_matches=128,
        )
    )
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}
    variables = jax.jit(functools.partial(model.init, train=True))(rngs, point, batch)
    params = variables["params"]
    for name in (
        "student_backbone", "teacher_backbone", "student_mask_head",
        "teacher_mask_head", "student_unmask_head", "enc2d", "patch_proj",
    ):
        assert name in params, name

    def loss_fn(p):
        o, _ = model.apply(
            {"params": p, "batch_stats": variables.get("batch_stats", {})},
            point, batch, train=True, mutable=["batch_stats"],
            rngs={"mask": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        )
        return o["loss"], o

    (loss, out), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    for key in ("mask_loss", "roll_mask_loss", "unmask_loss", "enc2d_loss"):
        assert key in out and np.isfinite(float(out[key])), key

    def gnorm(sub):
        return sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(sub))

    assert gnorm(g["teacher_backbone"]) == 0.0
    assert gnorm(g["teacher_mask_head"]) == 0.0
    assert gnorm(g["enc2d"]) == 0.0
    assert gnorm(g["student_backbone"]) > 0.0
    assert gnorm(g["student_mask_head"]) > 0.0
    assert gnorm(g["patch_proj"]) > 0.0


def test_concerto_pooled_upcast_level(rng):
    """Reference regime (pretrain-concerto-v1m1-0-base.py:89-90): distillation
    at up_cast_level=2 above the bottleneck with radius-matched views and
    pooled correspondences (PTv3 enc-mode backbone)."""
    batch = _concerto_batch(rng)
    point = build_point_batch(batch, 1)
    model = MODELS.build(
        dict(
            type="Concerto-v1m1",
            backbone=dict(
                type="PT-v3m1", in_channels=3,
                stride=(2, 2), enc_depths=(1, 1, 1), enc_channels=(8, 16, 16),
                enc_num_head=(2, 2, 2), enc_patch_size=(16, 16, 16),
                dec_depths=(1, 1), dec_channels=(8, 16), dec_num_head=(2, 2),
                dec_patch_size=(16, 16), mlp_ratio=1, drop_path=0.0,
                slot_divisors=(1, 2, 4), stem_kernel=3, shuffle_orders=False,
            ),
            backbone_in_channels=3,
            up_cast_level=1,  # features one level above the bottleneck
            match_max_r=0.5,
            num_global_view=2,
            num_local_view=2,
            head_hidden_channels=32,
            head_embed_channels=16,
            head_num_prototypes=32,
            enc2d_embed_channels=16,
            enc2d_depth=1,
            enc2d_num_heads=2,
            patch_size=PS,
            patch_h=PH,
            patch_w=PW,
            num_matches=128,
        )
    )
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}
    variables = jax.jit(functools.partial(model.init, train=True))(rngs, point, batch)

    def loss_fn(p):
        o, _ = model.apply(
            {"params": p, "batch_stats": variables.get("batch_stats", {})},
            point, batch, train=True, mutable=["batch_stats"],
            rngs={"mask": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3),
                  "shuffle": jax.random.PRNGKey(4)},
        )
        return o["loss"], o

    (loss, out), g = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    for key in ("mask_loss", "roll_mask_loss", "unmask_loss", "enc2d_loss"):
        assert key in out and np.isfinite(float(out[key])), key

    def gnorm(sub):
        return sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(sub))

    assert gnorm(g["teacher_backbone"]) == 0.0
    assert gnorm(g["student_backbone"]) > 0.0

    # scheduled masking rides the batch (SSLSchedule hook contract)
    batch2 = dict(batch)
    batch2["mask_size"] = np.float32(0.2)
    batch2["mask_ratio"] = np.float32(0.9)
    batch2["teacher_temp"] = np.float32(0.05)
    o2 = model.apply(
        {"params": variables["params"], "batch_stats": variables.get("batch_stats", {})},
        point, batch2, train=True, mutable=["batch_stats"],
        rngs={"mask": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3),
              "shuffle": jax.random.PRNGKey(4)},
    )[0]
    assert np.isfinite(float(o2["loss"]))
