"""Normalization / regularization primitives over masked point batches.

Replaces torch BatchNorm1d/LayerNorm as used by the reference backbones.
``MaskedBatchNorm`` computes statistics over valid points only; under pjit
with the batch sharded over the ``data`` mesh axis the reductions are global,
so multi-device behavior matches the reference's SyncBN conversion
(`engines/train.py:256-257`) by construction.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..parallel.mesh import psum_if_bound


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the point dimension, ignoring invalid rows.

    Mirrors torch ``BatchNorm1d(eps, momentum)`` semantics: running stats are
    EMA-updated with ``momentum`` (torch convention: new = (1-m)*old + m*batch).
    """

    features: int
    eps: float = 1e-3
    momentum: float = 0.01
    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, x, valid, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param("use_running_average", self.use_running_average, use_running_average)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            w = valid.astype(jnp.float32)[:, None]
            xf = x.astype(jnp.float32)
            # psum_if_bound: statistics stay GLOBAL under the shard_map train
            # step (identity under plain jit, where the sharded sum already is)
            count = jnp.maximum(psum_if_bound(jnp.sum(w)), 1.0)
            mean = psum_if_bound(jnp.sum(xf * w, axis=0)) / count
            var = psum_if_bound(jnp.sum(jnp.square(xf - mean) * w, axis=0)) / count
            if not self.is_initializing():
                ra_mean.value = (1.0 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1.0 - self.momentum) * ra_var.value + self.momentum * var

        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class LayerNorm(nn.Module):
    """Per-point LayerNorm (no masking needed: each row normalizes itself)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, valid=None):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class CondLayerNorm(nn.Module):
    """Prompt-driven LayerNorm: per-condition scale/bias tables.

    The PDNorm LN half (`prompt_driven_normalization.py:7-47` with an ln
    factory): one stat computation, decoupled affine parameters gathered by
    each point's dataset-condition index."""

    features: int
    num_conditions: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, condition, valid=None):
        M = self.num_conditions
        scale = self.param("scale", nn.initializers.ones, (M, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (M, self.features), jnp.float32)
        cond = jnp.clip(condition, 0, M - 1)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * jnp.take(scale, cond, axis=0) + jnp.take(bias, cond, axis=0)
        return y.astype(x.dtype)


class DropPath(nn.Module):
    """Stochastic depth per point-cloud sample (timm drop_path semantics).

    ``rate`` may be overridden at call time with a traced scalar (used by
    scan-over-blocks stages where the rate varies per layer)."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, num_samples: int, deterministic: Optional[bool] = None, rate=None):
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        r = self.rate if rate is None else rate
        if det or (isinstance(r, float) and r == 0.0):
            return x
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1.0 - r, (num_samples,))
        n = x.shape[0]
        s = n // num_samples
        per_point = jnp.repeat(keep, s)[:, None]
        return jnp.where(per_point, x / (1.0 - r), 0.0).astype(x.dtype)
