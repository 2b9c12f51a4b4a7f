"""SO(3)/SE(3) primitives (jnp, batched, jit-safe).

Foundation for the FAST-LIO2-style odometry stack (BASELINE.json north star;
no reference implementation exists — the reference only *feeds* an external
FAST-LIO2, see SURVEY.md §2.9).  Rotations are 3x3 matrices; tangent vectors
are [w, v] twists (rotation first).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """so(3) hat: [..., 3] -> [..., 3, 3]."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], -1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], -1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], -1),
        ],
        -2,
    )


def so3_exp(w):
    """Rodrigues: [..., 3] -> [..., 3, 3]."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]  # [..., 1, 1]
    K = hat(w / jnp.maximum(theta[..., 0], _EPS))
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    s, c = jnp.sin(theta), jnp.cos(theta)
    R = eye + s * K + (1 - c) * (K @ K)
    # small-angle fallback
    R_small = eye + hat(w)
    return jnp.where(theta > 1e-6, R, R_small)


def so3_log(R):
    """[..., 3, 3] -> [..., 3]."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((trace - 1) / 2, -1 + 1e-7, 1 - 1e-7)
    theta = jnp.arccos(cos_theta)
    w_hat = (R - jnp.swapaxes(R, -1, -2)) / 2
    w = jnp.stack([w_hat[..., 2, 1], w_hat[..., 0, 2], w_hat[..., 1, 0]], -1)
    scale = jnp.where(theta[..., None] > 1e-6, theta[..., None] / jnp.maximum(jnp.sin(theta)[..., None], _EPS), 1.0)
    return w * scale


def se3_exp(xi):
    """Twist [..., 6] (w, v) -> (R [..., 3, 3], t [..., 3])."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]
    K = hat(w / jnp.maximum(theta[..., 0], _EPS))
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    s, c = jnp.sin(theta), jnp.cos(theta)
    V = eye + (1 - c) / jnp.maximum(theta, _EPS) * K + (theta - s) / jnp.maximum(theta, _EPS) * (K @ K)
    V = jnp.where(theta > 1e-6, V, eye + hat(w) / 2)
    t = (V @ v[..., None])[..., 0]
    return R, t


def se3_compose(R1, t1, R2, t2):
    """(R1, t1) ∘ (R2, t2)."""
    return R1 @ R2, (R1 @ t2[..., None])[..., 0] + t1


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def transform(R, t, points):
    """Apply (R, t) to points [..., N, 3]."""
    return points @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
