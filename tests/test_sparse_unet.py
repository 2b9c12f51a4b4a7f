"""SpUNet backbone: shape, masking, and gradient sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcept_keypointdetection_tpu.models import MODELS, PointBatch


def make_point_batch(rng, B=2, S=256, C=4, extent=16):
    coords = rng.uniform(0, extent * 0.05, (B, S, 3)).astype(np.float32)
    grid = np.floor(coords / 0.05).astype(np.int32)
    # dedup voxels per sample so grid_coords are unique (GridSample contract)
    valid = np.zeros((B, S), bool)
    for b in range(B):
        _, first = np.unique(grid[b, :, 0] * 10**6 + grid[b, :, 1] * 10**3 + grid[b, :, 2], return_index=True)
        n_valid = min(len(first), S - 16)  # leave some padding
        valid[b, first[:n_valid]] = True
    feat = rng.normal(size=(B, S, C)).astype(np.float32)
    feat[~valid] = 0
    return PointBatch(
        coord=jnp.asarray(coords.reshape(-1, 3)),
        feat=jnp.asarray(feat.reshape(-1, C)),
        grid_coord=jnp.asarray(grid.reshape(-1, 3)),
        valid=jnp.asarray(valid.reshape(-1)),
        num_samples=B,
    )


@pytest.fixture(scope="module")
def small_unet():
    return MODELS.build(
        dict(
            type="SpUNet-v1m1",
            in_channels=4,
            num_classes=5,
            base_channels=8,
            channels=(8, 16, 16, 16, 16, 16, 8, 8),
            layers=(1, 1, 1, 1, 1, 1, 1, 1),
            stem_kernel=3,
        )
    )


def test_spunet_forward_shapes(rng, small_unet):
    point = make_point_batch(rng)
    params = small_unet.init(jax.random.PRNGKey(0), point, train=False)
    logits = small_unet.apply(params, point, train=False)
    assert logits.shape == (512, 5)
    assert np.isfinite(np.asarray(logits)).all()


def test_spunet_invalid_points_do_not_affect_valid(rng, small_unet):
    point = make_point_batch(rng)
    params = small_unet.init(jax.random.PRNGKey(0), point, train=False)
    logits1 = np.asarray(small_unet.apply(params, point, train=False))
    # perturb features of invalid points only
    noise = jnp.where(point.valid[:, None], 0.0, 37.0)
    point2 = point.replace(feat=point.feat + noise)
    logits2 = np.asarray(small_unet.apply(params, point2, train=False))
    v = np.asarray(point.valid)
    np.testing.assert_allclose(logits1[v], logits2[v], rtol=1e-4, atol=1e-4)


def test_spunet_train_step_decreases_loss(rng, small_unet):
    import optax

    from pointcept_keypointdetection_tpu.models.losses import build_criteria

    point = make_point_batch(rng)
    target = jnp.asarray(rng.integers(0, 5, point.num_points).astype(np.int32))
    variables = small_unet.init(jax.random.PRNGKey(0), point, train=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    crit = build_criteria([dict(type="CrossEntropyLoss")])

    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            out, updates = small_unet.apply(
                {"params": p, "batch_stats": batch_stats}, point, train=True, mutable=["batch_stats"]
            )
            return crit(out, target, valid=point.valid), updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state2 = tx.update(grads, opt_state)
        return optax.apply_updates(params, upd), new_bs, opt_state2, loss

    losses = []
    for _ in range(30):
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.6, losses
