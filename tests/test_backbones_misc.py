"""OctFormer + OA-CNNs backbone smoke tests."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcept_keypointdetection_tpu.models import MODELS, PointBatch


def _point(rng, B=2, S=128, C=4):
    coords = rng.uniform(0, 1.2, (B, S, 3)).astype(np.float32)
    grid = np.floor(coords / 0.05).astype(np.int32)
    valid = np.ones((B, S), bool)
    valid[:, -12:] = False
    feat = rng.normal(size=(B, S, C)).astype(np.float32)
    feat[~valid] = 0
    return PointBatch(
        coord=jnp.asarray(coords.reshape(-1, 3)),
        feat=jnp.asarray(feat.reshape(-1, C)),
        grid_coord=jnp.asarray(grid.reshape(-1, 3)),
        valid=jnp.asarray(valid.reshape(-1)),
        num_samples=B,
    )


@pytest.mark.parametrize(
    "cfg,out_dim",
    [
        (
            dict(
                type="OctFormer-v1m1",
                in_channels=4,
                channels=(16, 32),
                num_blocks=(2, 2),
                num_heads=(2, 4),
                patch_size=16,
                dilation=2,
                slot_divisors=(1, 2),
                num_classes=5,
            ),
            5,
        ),
        (
            dict(
                type="OA-CNNs",
                in_channels=4,
                num_classes=5,
                base_channels=8,
                channels=(8, 16),
                layers=(1, 1),
                slot_divisors=(1, 2),
            ),
            5,
        ),
    ],
)
def test_backbone_forward(rng, cfg, out_dim):
    model = MODELS.build(dict(cfg))
    point = _point(rng)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, point
    )
    out = model.apply(variables, point, train=False)
    assert out.shape == (256, out_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_spvcnn_forward(rng):
    model = MODELS.build(
        dict(type="SPVCNN", in_channels=4, num_classes=5, base_channels=8,
             channels=(8, 16), layers=(1, 1), slot_divisors=(1, 2))
    )
    point = _point(rng)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, point
    )
    out = model.apply(variables, point, train=False)
    assert out.shape == (256, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_stratified_transformer_forward(rng):
    model = MODELS.build(
        dict(type="ST-v1m2", in_channels=4, channels=(16, 32), depths=(1, 1),
             num_heads=(2, 4), patch_size=16, super_ratio=2,
             slot_divisors=(1, 2), num_classes=5)
    )
    point = _point(rng)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, point
    )
    out = model.apply(variables, point, train=False)
    assert out.shape == (256, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_spvcnn_trilinear_devoxelize():
    """voxel_to_point interpolates exactly: center -> identity, midpoint -> mean."""
    import jax.numpy as jnp

    from pointcept_keypointdetection_tpu.models.spvcnn import voxel_to_point_trilinear
    from pointcept_keypointdetection_tpu.models.structure import PointBatch

    # stage: two voxels at grid (0,0,0) and (1,0,0), features 1 and 3
    stage = PointBatch(
        coord=jnp.asarray([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5]], jnp.float32),
        feat=jnp.asarray([[1.0], [3.0]], jnp.float32),
        grid_coord=jnp.asarray([[0, 0, 0], [1, 0, 0]], jnp.int32),
        valid=jnp.ones(2, bool),
        num_samples=1,
    )
    # queries: voxel-0 center, halfway between centers, voxel-1 center
    cont = jnp.asarray([[0.5, 0.5, 0.5], [1.0, 0.5, 0.5], [1.5, 0.5, 0.5]], jnp.float32)
    pts = PointBatch(
        coord=cont,  # unused by the op besides shapes
        feat=jnp.zeros((3, 1), jnp.float32),
        grid_coord=jnp.floor(cont).astype(jnp.int32),
        valid=jnp.ones(3, bool),
        num_samples=1,
    )
    out = np.asarray(voxel_to_point_trilinear(stage, pts, cont, stride=1)).reshape(-1)
    np.testing.assert_allclose(out, [1.0, 2.0, 3.0], atol=1e-5)


def test_kpconv_stem_center_influence():
    """A lone point's only neighbor is itself: rel=0 hits only the CENTER
    kernel point (shell points sit at 0.66r > 0.3r extent), so the output is
    exactly feat @ W[0]."""
    import jax
    import jax.numpy as jnp

    from pointcept_keypointdetection_tpu.models.stratified_transformer import KPConvStem
    from pointcept_keypointdetection_tpu.models.structure import PointBatch

    pt = PointBatch(
        coord=jnp.asarray([[0.0, 0, 0], [100.0, 100, 100]], jnp.float32),  # 2nd far away
        feat=jnp.asarray([[1.0, 2.0], [0.0, 0.0]], jnp.float32),
        grid_coord=jnp.zeros((2, 3), jnp.int32),
        valid=jnp.asarray([True, False]),
        num_samples=1,
    )
    stem = KPConvStem(channels=4, radius=0.2, num_neighbors=2)
    variables = stem.init(jax.random.PRNGKey(0), pt, False)
    out = stem.apply(variables, pt, False)
    w0 = variables["params"]["weight"][0]  # [Cin, Cout]
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(jnp.asarray([1.0, 2.0]) @ w0), rtol=1e-5
    )
