"""Swin3D windowed-attention backbone."""

import jax
import jax.numpy as jnp
import numpy as np

from pointcept_keypointdetection_tpu.models import MODELS, PointBatch


def _point(rng, B=2, S=256, C=4):
    coords = rng.uniform(0, 1.5, (B, S, 3)).astype(np.float32)
    grid = np.floor(coords / 0.05).astype(np.int32)
    valid = np.ones((B, S), bool)
    valid[:, -20:] = False
    feat = rng.normal(size=(B, S, C)).astype(np.float32)
    feat[~valid] = 0
    return PointBatch(
        coord=jnp.asarray(coords.reshape(-1, 3)),
        feat=jnp.asarray(feat.reshape(-1, C)),
        grid_coord=jnp.asarray(grid.reshape(-1, 3)),
        valid=jnp.asarray(valid.reshape(-1)),
        num_samples=B,
    )


def test_swin3d_forward_and_mask(rng):
    model = MODELS.build(
        dict(
            type="Swin3D-v1m1",
            in_channels=4,
            depths=(1, 1),
            channels=(16, 32),
            num_heads=(2, 4),
            window_sizes=(4, 4),
            patch_size=32,
            slot_divisors=(1, 2),
            num_classes=5,
        )
    )
    point = _point(rng)
    import functools

    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, point
    )
    logits = model.apply(variables, point, train=False)
    assert logits.shape == (512, 5)
    assert np.isfinite(np.asarray(logits)).all()

    point2 = point.replace(feat=point.feat + jnp.where(point.valid[:, None], 0.0, 9.0))
    l2 = model.apply(variables, point2, train=False)
    v = np.asarray(point.valid)
    np.testing.assert_allclose(np.asarray(logits)[v], np.asarray(l2)[v], rtol=2e-3, atol=2e-3)


def test_swin3d_crse_modes(rng):
    """Full cRSE (XYZ+RGB+NORM tables on q/k/v) runs and differentiates."""
    import jax
    import jax.numpy as jnp

    from pointcept_keypointdetection_tpu.models import MODELS, PointBatch

    n, cin = 256, 6
    coord = rng.uniform(0, 2, (n, 3)).astype(np.float32)
    grid = np.floor(coord / 0.05).astype(np.int32)
    feat = rng.uniform(-1, 1, (n, cin)).astype(np.float32)
    model = MODELS.build(dict(
        type="Swin3D-v1m1", in_channels=cin, depths=(1, 1), channels=(16, 32),
        num_heads=(2, 2), window_sizes=(4, 4), patch_size=32,
        slot_divisors=(1, 2), num_classes=5, crse="XYZ_RGB_NORM", quant_size=2,
        voxel_size=0.05,
    ))
    point = PointBatch(
        coord=jnp.asarray(coord), feat=jnp.asarray(feat),
        grid_coord=jnp.asarray(grid), valid=jnp.ones(n, bool), num_samples=1,
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, point, train=False)
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = ["/".join(str(k.key) for k in path) for path, _ in flat]
    for g in ("xyz", "rgb", "norm"):
        for t in ("q", "k", "v"):
            assert any(f"{g}_{t}_table" in nm for nm in names), (g, t)

    bs = variables.get("batch_stats", {})

    def loss(params):
        out = model.apply({"params": params, "batch_stats": bs}, point, train=False)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    val, grads = jax.value_and_grad(loss)(variables["params"])
    assert np.isfinite(float(val))
    # the signal tables receive gradient (cRSE is live, not decorative)
    gflat = jax.tree_util.tree_leaves_with_path(grads)
    for path, g in gflat:
        nm = "/".join(str(k.key) for k in path)
        if "rgb_q_table" in nm or "xyz_v_table" in nm:
            assert float(jnp.abs(g).sum()) > 0, nm
