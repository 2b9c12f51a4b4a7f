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


def test_stratified_rpe_matches_oracle(rng):
    """StratifiedAttention's learned relative-position bias must equal the
    reference `dot_prod_with_idx` semantics: logits += sum over the 3 axes of
    table[clip(rel_axis, -b, b) + b + axis*(2b+1), head] — checked against an
    independent numpy reimplementation of the whole biased attention on one
    window (reference kernels:
    `libs/pointops2/src/rpe_v2/relative_pos_encoding_cuda_kernel_v2.cu`)."""
    import jax.numpy as jnp

    from pointcept_keypointdetection_tpu.models.stratified_transformer import (
        StratifiedAttention,
    )
    from pointcept_keypointdetection_tpu.models.structure import PointBatch

    n, c, h, k = 16, 8, 2, 16  # one window, one patch (p = 1, super too)
    coords = rng.uniform(0, 0.9, (n, 3)).astype(np.float32)
    grid = np.floor(coords / 0.05).astype(np.int32)
    point = PointBatch(
        coord=jnp.asarray(coords),
        feat=jnp.asarray(rng.normal(size=(n, c)).astype(np.float32)),
        grid_coord=jnp.asarray(grid),
        valid=jnp.ones(n, bool),
        num_samples=1,
    ).serialize(orders=("z",), depth=16)

    attn = StratifiedAttention(c, h, k, super_ratio=1, enable_rpe=True, rpe_bound=4)
    variables = attn.init({"params": jax.random.PRNGKey(0)}, point, False)
    out = np.asarray(attn.apply(variables, point, False))

    # ---- numpy oracle ---------------------------------------------------
    p = variables["params"]
    order = np.asarray(point.serialized_order)[0]
    x = np.asarray(point.feat)
    qkv = x @ np.asarray(p["qkv"]["kernel"]) + np.asarray(p["qkv"]["bias"])
    qkv_s = qkv[order].reshape(n, 3, h, c // h)
    g_s = grid[order]
    table = np.asarray(p["rpe_table"])  # [3*(2b+1), h]
    b = 4
    d = c // h
    # super_ratio=1: keys = [local, stride-1 subsample] = window twice
    keys_g = np.concatenate([g_s, g_s], axis=0)  # [2k, 3]
    out_sorted = np.zeros((n, c), np.float32)
    for head in range(h):
        q = qkv_s[:, 0, head] * d**-0.5
        kk = np.concatenate([qkv_s[:, 1, head], qkv_s[:, 1, head]], axis=0)
        vv = np.concatenate([qkv_s[:, 2, head], qkv_s[:, 2, head]], axis=0)
        logits = q @ kk.T  # [k, 2k]
        for i in range(n):
            for j in range(2 * n):
                rel = g_s[i] - keys_g[j]
                bias = sum(
                    table[int(np.clip(rel[a], -b, b)) + b + a * (2 * b + 1), head]
                    for a in range(3)
                )
                logits[i, j] += bias
        w = np.exp(logits - logits.max(1, keepdims=True))
        w /= w.sum(1, keepdims=True)
        out_sorted[:, head * d : (head + 1) * d] = w @ vv
    inv = np.asarray(point.serialized_inverse)[0]
    expect = out_sorted[inv] @ np.asarray(p["proj"]["kernel"]) + np.asarray(p["proj"]["bias"])
    np.testing.assert_allclose(out, expect, rtol=2e-3, atol=2e-3)


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
