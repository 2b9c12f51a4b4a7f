"""Pallas patch-attention kernel vs the XLA reference (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcept_keypointdetection_tpu.ops.attention import patch_attention_xla


def _pallas_interp(qkv, valid, patch, scale):
    from jax.experimental import pallas as pl

    import pointcept_keypointdetection_tpu.ops.pallas.patch_attention as m

    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        return m._pallas_forward(qkv, valid, patch, scale)
    finally:
        pl.pallas_call = orig


@pytest.mark.parametrize("patch,heads,dim", [(16, 2, 8), (128, 4, 16)])
def test_pallas_matches_xla(rng, patch, heads, dim):
    n = patch * 8
    qkv = rng.normal(size=(n, 3, heads, dim)).astype(np.float32)
    valid = rng.random(n) > 0.2
    scale = dim**-0.5
    ref = patch_attention_xla(jnp.asarray(qkv), jnp.asarray(valid), patch, scale)
    out = _pallas_interp(jnp.asarray(qkv), jnp.asarray(valid), patch, scale)
    v = np.repeat(valid, 1)
    np.testing.assert_allclose(np.asarray(out)[v], np.asarray(ref)[v], rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("patch,heads,dim", [(16, 2, 8), (64, 4, 16)])
def test_pallas_backward_matches_xla(rng, patch, heads, dim):
    """Fused Pallas backward vs the XLA vjp (interpret mode)."""
    from jax.experimental import pallas as pl

    import pointcept_keypointdetection_tpu.ops.pallas.patch_attention as m

    n = patch * 4
    qkv = jnp.asarray(rng.normal(size=(n, 3, heads, dim)).astype(np.float32))
    valid = jnp.asarray(rng.random(n) > 0.2)
    g = jnp.asarray(rng.normal(size=(n, heads * dim)).astype(np.float32))
    scale = dim**-0.5

    _, vjp = jax.vjp(lambda q: patch_attention_xla(q, valid, patch, scale), qkv)
    (ref,) = vjp(g)

    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        out = m._pallas_backward(qkv, valid, g, patch, scale)
    finally:
        pl.pallas_call = orig
    # invalid rows contribute nothing to valid rows' gradients; compare valid
    v = np.asarray(valid)
    np.testing.assert_allclose(
        np.asarray(out)[v], np.asarray(ref)[v], rtol=3e-4, atol=3e-4
    )
