"""Sonata SSL: sinkhorn, forward, teacher EMA semantics."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pointcept_keypointdetection_tpu.datasets.collate import collate, pad_sample
from pointcept_keypointdetection_tpu.engines.common import build_point_batch
from pointcept_keypointdetection_tpu.models import MODELS
from pointcept_keypointdetection_tpu.models.sonata import sinkhorn


def test_sinkhorn_doubly_stochasticish(rng):
    logits = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    q = np.asarray(sinkhorn(logits * 3.0, iters=5))
    np.testing.assert_allclose(q.sum(axis=1), 1.0, atol=1e-3)  # rows sum to 1
    # prototype usage must be far more balanced than a plain sharp softmax
    raw = np.asarray(jax.nn.softmax(logits * 3.0, axis=-1))
    ratio_q = q.sum(0).max() / max(q.sum(0).min(), 1e-9)
    ratio_raw = raw.sum(0).max() / max(raw.sum(0).min(), 1e-9)
    assert ratio_q < 1.5 and ratio_q < ratio_raw / 3, (ratio_q, ratio_raw)


def _ssl_batch(rng, slot=256):
    from tests.test_msc import _ssl_sample

    sample = _ssl_sample(rng, n=400)
    batch_np = collate([pad_sample(sample, slot)], slot)
    return {k: jnp.asarray(v) for k, v in batch_np.items() if not isinstance(v, (list, int))}


def test_sonata_forward_and_ema(rng):
    batch = _ssl_batch(rng)
    point = build_point_batch(batch, 1)
    model = MODELS.build(
        dict(
            type="Sonata-v1m1",
            backbone=dict(
                type="SpUNet-v1m1", in_channels=3, num_classes=0, base_channels=8,
                channels=(8, 16, 16, 16, 16, 16, 8, 8), layers=(1,) * 8, stem_kernel=3,
            ),
            backbone_in_channels=3,
            num_prototypes=32,
            proj_dim=16,
            num_matches=128,
        )
    )
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}
    variables = jax.jit(functools.partial(model.init, train=True))(rngs, point, batch)
    params = variables["params"]
    assert "student_backbone" in params and "teacher_backbone" in params
    out, _ = model.apply(
        {"params": params, "batch_stats": variables.get("batch_stats", {})},
        point, batch, train=True, mutable=["batch_stats"],
        rngs={"mask": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
    )
    assert np.isfinite(float(out["loss"]))

    # teacher gets no gradient; student does
    def loss_fn(p):
        o, _ = model.apply(
            {"params": p, "batch_stats": variables.get("batch_stats", {})},
            point, batch, train=True, mutable=["batch_stats"],
            rngs={"mask": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        )
        return o["loss"]

    g = jax.grad(loss_fn)(params)
    t_norm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g["teacher_backbone"]))
    s_norm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g["student_backbone"]))
    assert t_norm == 0.0
    assert s_norm > 0.0


def test_sonata_uni_head_variant(rng):
    """Sonata-v1m2: the teacher shares the student's projection head — no
    separate teacher_head params (`sonata_v1m2_uni_teacher_head.py`)."""
    batch = _ssl_batch(rng)
    point = build_point_batch(batch, 1)
    model = MODELS.build(
        dict(
            type="Sonata-v1m2",
            uni_head=True,
            backbone=dict(
                type="SpUNet-v1m1", in_channels=3, num_classes=0, base_channels=8,
                channels=(8, 16, 16, 16, 16, 16, 8, 8), layers=(1,) * 8, stem_kernel=3,
            ),
            backbone_in_channels=3,
            num_prototypes=32,
            proj_dim=16,
            num_matches=128,
        )
    )
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}
    variables = jax.jit(functools.partial(model.init, train=True))(rngs, point, batch)
    assert "student_mask_head" in variables["params"]
    assert "teacher_mask_head" not in variables["params"]
    out, _ = model.apply(
        variables, point, batch, train=True, mutable=["batch_stats"],
        rngs={"mask": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
    )
    assert np.isfinite(float(out["loss"]))


def _multiview_batch(rng, slot=256, locals_n=2):
    from pointcept_keypointdetection_tpu.datasets.transform import TRANSFORMS

    coord = rng.uniform(0, 2, (500, 3)).astype(np.float32)
    color = rng.uniform(0, 1, (500, 3)).astype(np.float32)
    gen = TRANSFORMS.build(
        dict(
            type="MultiViewGenerator",
            local_view_num=locals_n,
            view_keys=("coord", "color"),
            global_slot=256,
            local_slot=128,
            global_transform=[
                dict(type="RandomJitter", sigma=0.003, clip=0.01),
                dict(type="GridSample", grid_size=0.05, mode="train", return_grid_coord=True),
            ],
            local_transform=[
                dict(type="GridSample", grid_size=0.05, mode="train", return_grid_coord=True),
            ],
        )
    )
    sample = gen(dict(coord=coord, color=color))
    batch_np = collate([pad_sample(sample, slot)], slot)
    return {k: jnp.asarray(v) for k, v in batch_np.items() if not isinstance(v, (list, int))}


def test_sonata_multicrop_three_losses(rng):
    """Full reference loss structure: mask + roll-mask + unmask over local
    crops, with scheduled scalars riding the batch (`sonata_v1m1_base.py`)."""
    batch = _multiview_batch(rng)
    batch["mask_ratio"] = jnp.float32(0.6)
    batch["mask_size"] = jnp.float32(0.3)
    batch["teacher_temp"] = jnp.float32(0.06)
    point = build_point_batch(batch, 1)
    model = MODELS.build(
        dict(
            type="Sonata-v1m1",
            backbone=dict(
                type="SpUNet-v1m1", in_channels=3, num_classes=0, base_channels=8,
                channels=(8, 16, 16, 16, 16, 16, 8, 8), layers=(1,) * 8, stem_kernel=3,
            ),
            backbone_in_channels=3,
            num_prototypes=32,
            proj_dim=16,
            head_hidden=32,
            num_matches=128,
            num_local_view=2,
            mask_jitter=0.005,
        )
    )
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}
    variables = jax.jit(functools.partial(model.init, train=True))(rngs, point, batch)
    params = variables["params"]
    for name in ("student_mask_head", "teacher_mask_head", "student_unmask_head", "teacher_unmask_head"):
        assert name in params, name
    out, _ = model.apply(
        variables, point, batch, train=True, mutable=["batch_stats"],
        rngs={"mask": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
    )
    for key in ("mask_loss", "roll_mask_loss", "unmask_loss", "loss"):
        assert key in out and np.isfinite(float(out[key])), (key, out.get(key))
    assert float(out["loss"]) > 0
