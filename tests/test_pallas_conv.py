"""Fused Pallas sparse conv == XLA gather conv (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcept_keypointdetection_tpu.ops.pallas.sparse_conv import (
    fused_subm_conv,
    fused_subm_conv_dw,
)
from pointcept_keypointdetection_tpu.ops.sparse import _conv_apply


def _case(n, k, cin, cout, seed=0):
    rng = np.random.default_rng(seed)
    feat = jnp.asarray(rng.normal(size=(n, cin)).astype(np.float32))
    # indices in [0, n]; n == missing-neighbor sentinel
    idx = jnp.asarray(rng.integers(0, n + 1, size=(n, k)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32) * 0.1)
    return feat, idx, w


@pytest.mark.parametrize("n,k,cin,cout", [(512, 27, 32, 32), (300, 7, 16, 48)])
def test_fused_conv_matches_xla(n, k, cin, cout):
    feat, idx, w = _case(n, k, cin, cout)
    ref = _conv_apply(feat, idx, w, im2col_max_width=1 << 30)
    got = fused_subm_conv(feat, idx, w, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_conv_dw_matches_einsum():
    n, k, cin, cout = 384, 27, 32, 32
    feat, idx, w = _case(n, k, cin, cout, seed=1)
    g = jnp.asarray(np.random.default_rng(2).normal(size=(n, cout)).astype(np.float32))
    feat_pad = jnp.concatenate([feat, jnp.zeros((1, cin), feat.dtype)], axis=0)
    gathered = jnp.take(feat_pad, idx, axis=0)  # [N, K, Cin]
    ref = jnp.einsum("nkc,nd->kcd", gathered, g)
    got = fused_subm_conv_dw(feat, idx, g, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_fused_conv_lowers_for_tpu():
    feat, idx, w = _case(1024, 27, 32, 32)
    jax.jit(lambda f, i, ww: fused_subm_conv(f, i, ww)).trace(feat, idx, w).lower(
        lowering_platforms=("tpu",)
    )
    jax.jit(lambda f, i, g: fused_subm_conv_dw(f, i, g)).trace(
        feat, idx, jnp.zeros((1024, 32), jnp.float32)
    ).lower(lowering_platforms=("tpu",))
