"""Per-iteration LR schedules.

Parity surface: `pointcept/utils/scheduler.py` — the SCHEDULERS registry with
MultiStepLR / MultiStepWithWarmupLR / PolyLR / ExpLR / CosineAnnealingLR /
OneCycleLR, all stepped per iteration with ``total_steps`` injected by the
trainer (`engines/train.py:341-345`).  Here each entry builds an optax
schedule fn ``step -> multiplier`` scaled by the base lr.
"""

from __future__ import annotations

import math
from typing import Sequence

import optax

from .registry import Registry

SCHEDULERS = Registry("schedulers")


@SCHEDULERS.register_module()
def MultiStepLR(total_steps: int, base_lr: float, milestones: Sequence[float], gamma: float = 0.1):
    boundaries = {int(m * total_steps): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


@SCHEDULERS.register_module()
def MultiStepWithWarmupLR(
    total_steps: int,
    base_lr: float,
    milestones: Sequence[float],
    gamma: float = 0.1,
    warmup_rate: float = 0.05,
    warmup_scale: float = 1e-6,
):
    warmup_steps = int(warmup_rate * total_steps)
    main = optax.piecewise_constant_schedule(base_lr, {int(m * total_steps): gamma for m in milestones})

    def schedule(step):
        import jax.numpy as jnp

        warm = warmup_scale + (1 - warmup_scale) * (step / max(warmup_steps, 1))
        scale = jnp.where(step < warmup_steps, warm, 1.0)
        return main(step) * scale

    return schedule


@SCHEDULERS.register_module()
def PolyLR(total_steps: int, base_lr: float, power: float = 0.9):
    # reference formula exactly: base_lr * (1 - s/(total+1))^power
    # (`scheduler.py:71-83`; optax.polynomial_schedule divides by total,
    # which diverges relatively at the schedule tail)
    def schedule(step):
        import jax.numpy as jnp

        frac = jnp.clip(1.0 - step / (total_steps + 1), 0.0, 1.0)
        return base_lr * frac**power

    return schedule


@SCHEDULERS.register_module()
def ExpLR(total_steps: int, base_lr: float, gamma: float = 0.9):
    return optax.exponential_decay(base_lr, total_steps, gamma)


@SCHEDULERS.register_module()
def CosineAnnealingLR(total_steps: int, base_lr: float, eta_min: float = 0.0):
    return optax.cosine_decay_schedule(base_lr, total_steps, alpha=eta_min / max(base_lr, 1e-12))


@SCHEDULERS.register_module()
def OneCycleLR(
    total_steps: int,
    max_lr: float,
    base_lr: float = None,  # unused; kept for config compat
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
    anneal_strategy: str = "cos",
):
    return optax.cosine_onecycle_schedule(total_steps, max_lr, pct_start, div_factor, final_div_factor)


def build_scheduler(cfg, total_steps: int, base_lr: float):
    cfg = dict(cfg)
    name = cfg.pop("type")
    fn = SCHEDULERS.get(name)
    if fn is None:
        raise KeyError(f"scheduler {name} not registered")
    if name == "OneCycleLR":
        cfg.setdefault("max_lr", base_lr)
        return fn(total_steps=total_steps, **cfg)
    return fn(total_steps=total_steps, base_lr=base_lr, **cfg)


class CosineScheduler:
    """Plain-value cosine schedule (reference `CosineScheduler`, used for
    weight decay / EMA momentum ramps)."""

    def __init__(self, start_value, final_value, total_steps):
        self.start_value = start_value
        self.final_value = final_value
        self.total_steps = total_steps

    def __call__(self, step):
        t = min(step / max(self.total_steps - 1, 1), 1.0)
        return self.final_value + 0.5 * (self.start_value - self.final_value) * (1 + math.cos(math.pi * t))
