"""PTv2 backbone: shapes, masking, learning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcept_keypointdetection_tpu.models import MODELS, PointBatch

BACKBONE = dict(
    type="PT-v2m2",
    in_channels=4,
    patch_embed_depth=1,
    patch_embed_channels=16,
    patch_embed_groups=4,
    patch_embed_neighbours=8,
    enc_depths=(1, 1),
    enc_channels=(32, 48),
    enc_groups=(8, 12),
    enc_neighbours=(8, 8),
    dec_depths=(1, 1),
    dec_channels=(16, 32),
    dec_groups=(4, 8),
    dec_neighbours=(8, 8),
    grid_sizes=(0.12, 0.24),
    drop_path_rate=0.1,
    slot_divisors=(2, 4),
)


def make_point_batch(rng, B=2, S=128, C=4):
    coords = rng.uniform(0, 1.0, (B, S, 3)).astype(np.float32)
    grid = np.floor(coords / 0.05).astype(np.int32)
    valid = np.ones((B, S), bool)
    valid[:, -12:] = False
    feat = rng.normal(size=(B, S, C)).astype(np.float32)
    feat[~valid] = 0
    coords[~valid] = 0
    return PointBatch(
        coord=jnp.asarray(coords.reshape(-1, 3)),
        feat=jnp.asarray(feat.reshape(-1, C)),
        grid_coord=jnp.asarray(grid.reshape(-1, 3)),
        valid=jnp.asarray(valid.reshape(-1)),
        num_samples=B,
    )


def test_ptv2_forward_and_mask(rng):
    model = MODELS.build(dict(BACKBONE))
    point = make_point_batch(rng)
    import functools

    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, point
    )
    feat = model.apply(variables, point, train=False)
    assert feat.shape == (256, 16)
    assert np.isfinite(np.asarray(feat)).all()

    # invalid-point isolation: perturbing invalid features must not change valid outputs
    point2 = point.replace(feat=point.feat + jnp.where(point.valid[:, None], 0.0, 5.0))
    f2 = model.apply(variables, point2, train=False)
    v = np.asarray(point.valid)
    np.testing.assert_allclose(np.asarray(feat)[v], np.asarray(f2)[v], rtol=2e-3, atol=2e-3)


def test_ptv2_segmentor_learns(rng):
    import optax

    model = MODELS.build(
        dict(
            type="DefaultSegmentor",
            backbone=dict(BACKBONE),
            criteria=[dict(type="CrossEntropyLoss")],
        )
    )
    point = make_point_batch(rng)
    # height-band labels — learnable from coords
    seg = (np.asarray(point.coord)[:, 2] > 0.5).astype(np.int32)
    batch = {"segment": jnp.asarray(seg)}
    import functools

    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, point, batch
    )
    params, bs = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, bs, opt, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": bs}, point, batch, train=True,
                mutable=["batch_stats"], rngs={"dropout": key},
            )
            return out["loss"], mut.get("batch_stats", {})

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt2 = tx.update(grads, opt)
        return optax.apply_updates(params, upd), new_bs, opt2, loss

    losses = []
    for i in range(20):
        params, bs, opt, loss = step(params, bs, opt, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses
