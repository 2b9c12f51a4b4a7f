"""Criteria builder: a weighted sum of registered losses.

Parity surface: `pointcept/models/losses/builder.py` — ``Criteria`` sums each
configured loss applied to (pred, target); every loss here additionally takes a
``valid`` mask because batches are padded.
"""

from ...utils.registry import Registry

LOSSES = Registry("losses")


class Criteria:
    def __init__(self, cfg=None):
        self.cfg = cfg if cfg is not None else []
        if not isinstance(self.cfg, (list, tuple)):
            self.cfg = [self.cfg]
        self.criteria = [LOSSES.build(c) for c in self.cfg]

    def __call__(self, pred, target, valid=None):
        if len(self.criteria) == 0:
            return pred
        total = 0.0
        for crit in self.criteria:
            total = total + crit(pred, target, valid=valid)
        return total


def build_criteria(cfg):
    return Criteria(cfg)
