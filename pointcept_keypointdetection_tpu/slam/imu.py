"""IMU preintegration (forward propagation between scans).

The FAST-LIO2-style state propagation the reference's bridge feeds with oxts
IMU packets (`SemanticFAST-LIO2-prediction/fusion_clean_bag.py:81-110`).
State: rotation R, velocity v, position p, gyro/accel biases; propagation by
midpoint integration over the IMU samples between two scans, producing the
pose prior for scan-to-map registration.  jit-safe over a fixed-size padded
sample window.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import se3

GRAVITY = jnp.asarray([0.0, 0.0, -9.81])


class ImuState(NamedTuple):
    R: jnp.ndarray  # [3, 3] world_R_body
    v: jnp.ndarray  # [3] world velocity
    p: jnp.ndarray  # [3] world position
    bg: jnp.ndarray  # [3] gyro bias
    ba: jnp.ndarray  # [3] accel bias

    @staticmethod
    def identity() -> "ImuState":
        return ImuState(
            R=jnp.eye(3), v=jnp.zeros(3), p=jnp.zeros(3), bg=jnp.zeros(3), ba=jnp.zeros(3)
        )


def propagate(
    state: ImuState,
    gyro: jnp.ndarray,  # [T, 3] body rates
    accel: jnp.ndarray,  # [T, 3] body accelerations
    dt: jnp.ndarray,  # [T] per-sample intervals (0 = padding)
) -> ImuState:
    """Midpoint-integrate a window of IMU samples (padded entries dt=0)."""

    def step(s: ImuState, inputs):
        w, a, h = inputs
        w = w - s.bg
        a = a - s.ba
        dR = se3.so3_exp(w * h)
        R_mid = s.R @ se3.so3_exp(w * h * 0.5)
        acc_w = (R_mid @ a) + GRAVITY
        v_new = s.v + acc_w * h
        p_new = s.p + s.v * h + 0.5 * acc_w * h * h
        return s._replace(R=s.R @ dR, v=v_new, p=p_new), None

    out, _ = jax.lax.scan(step, state, (gyro, accel, dt))
    return out


def pose_prior(state: ImuState):
    """(R, t) prior for registration from the propagated state."""
    return state.R, state.p
