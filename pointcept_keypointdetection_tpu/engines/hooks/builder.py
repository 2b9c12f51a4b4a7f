"""Hook registry (parity: `pointcept/engines/hooks/builder.py`)."""

from ...utils.registry import Registry

HOOKS = Registry("hooks")


def build_hooks(cfg):
    return [HOOKS.build(dict(c)) for c in (cfg or [])]
