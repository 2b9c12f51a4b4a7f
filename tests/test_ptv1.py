"""PTv1 backbone smoke test."""

import jax
import jax.numpy as jnp
import numpy as np

from pointcept_keypointdetection_tpu.models import MODELS, PointBatch


def test_ptv1_forward(rng):
    model = MODELS.build(
        dict(
            type="PT-v1",
            in_channels=4,
            planes=(8, 16, 24),
            blocks=(1, 1, 1),
            strides=(1, 4, 4),
            nsample=(8, 8, 8),
            share_planes=4,
        )
    )
    B, S = 2, 128
    coords = rng.uniform(0, 1, (B, S, 3)).astype(np.float32)
    valid = np.ones((B, S), bool)
    valid[:, -10:] = False
    feat = rng.normal(size=(B, S, 4)).astype(np.float32)
    point = PointBatch(
        coord=jnp.asarray(coords.reshape(-1, 3)),
        feat=jnp.asarray(feat.reshape(-1, 4)),
        grid_coord=jnp.asarray(np.floor(coords / 0.05).astype(np.int32).reshape(-1, 3)),
        valid=jnp.asarray(valid.reshape(-1)),
        num_samples=B,
    )
    import functools

    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, point
    )
    out = model.apply(variables, point, train=False)
    assert out.shape == (B * S, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_ptv1_bucketed_knn_close_to_brute(rng):
    """PTv1 with per-stage grid-bucketed knn (VERDICT r2 item 7) must produce
    near-identical features to the brute-force configuration when cells are
    large enough to make the bucketed search exact."""
    conf = dict(
        type="PT-v1",
        in_channels=4,
        planes=(8, 16, 24),
        blocks=(1, 1, 1),
        strides=(1, 4, 4),
        nsample=(8, 8, 8),
        share_planes=4,
    )
    B, S = 2, 256
    coords = rng.uniform(0, 1, (B, S, 3)).astype(np.float32)
    valid = np.ones((B, S), bool)
    valid[:, -10:] = False
    feat = rng.normal(size=(B, S, 4)).astype(np.float32)
    point = PointBatch(
        coord=jnp.asarray(coords.reshape(-1, 3)),
        feat=jnp.asarray(feat.reshape(-1, 4)),
        grid_coord=jnp.asarray(np.floor(coords / 0.05).astype(np.int32).reshape(-1, 3)),
        valid=jnp.asarray(valid.reshape(-1)),
        num_samples=B,
    )
    import functools

    brute = MODELS.build(conf)
    variables = jax.jit(functools.partial(brute.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, point
    )
    out_brute = brute.apply(variables, point, train=False)
    # cells ~2x the per-level point spacing: ring covers the k-th neighbor
    # without overflowing the 64-candidate cell cap
    bucketed = MODELS.build(dict(conf, knn_cell_sizes=(0.35, 0.55, 0.9)))
    out_bucket = bucketed.apply(variables, point, train=False)
    np.testing.assert_allclose(
        np.asarray(out_brute), np.asarray(out_bucket), rtol=2e-3, atol=2e-3
    )
