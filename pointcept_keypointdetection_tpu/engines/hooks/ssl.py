"""SSL training-schedule hooks.

Parity surface: the reference Sonata's scheduler machinery
(`sonata_v1m1_base.py:188-259`: ``before_train`` builds CosineSchedulers for
mask_size / mask_ratio / teacher_temp / EMA momentum; ``before_step`` steps
them and logs ``params/*``).  Here the model is a pure function, so the hook
injects the scheduled values into the batch dict as numpy scalars each step —
they become replicated device scalars through ``shard_batch`` and change
every step without recompilation.  EMA momentum is scheduled inside the
jitted train step itself (``cfg.ema.momentum`` dict, engines/train.py).
"""

from __future__ import annotations

import numpy as np

from .builder import HOOKS
from .default import HookBase


def cosine_warmup(step, total, start, base, warmup_ratio=0.05):
    """Cosine ramp start -> base over ``warmup_ratio * total`` steps, then
    flat at ``base`` (the reference CosineScheduler with final == base)."""
    warm = max(int(total * warmup_ratio), 1)
    if step >= warm:
        return base
    frac = step / warm
    return base - (base - start) * 0.5 * (1.0 + np.cos(np.pi * frac))


@HOOKS.register_module()
class SonataScheduler(HookBase):
    """Inject scheduled mask_size / mask_ratio / teacher_temp into every batch."""

    def __init__(
        self,
        mask_size_start=0.1,
        mask_size_base=0.4,
        mask_size_warmup_ratio=0.05,
        mask_ratio_start=0.3,
        mask_ratio_base=0.7,
        mask_ratio_warmup_ratio=0.05,
        teacher_temp_start=0.04,
        teacher_temp_base=0.07,
        teacher_temp_warmup_ratio=0.05,
    ):
        self.cfg = dict(
            mask_size=(mask_size_start, mask_size_base, mask_size_warmup_ratio),
            mask_ratio=(mask_ratio_start, mask_ratio_base, mask_ratio_warmup_ratio),
            teacher_temp=(teacher_temp_start, teacher_temp_base, teacher_temp_warmup_ratio),
        )

    def before_step(self):
        trainer = self.trainer
        step = int(trainer.state.step)
        total = trainer.total_steps
        batch = trainer.comm_info.get("input_dict")
        if batch is None:
            return
        for key, (start, base, warm) in self.cfg.items():
            value = cosine_warmup(step, total, start, base, warm)
            batch[key] = np.float32(value)
            trainer.storage.put_scalar(f"params/{key}", float(value))
