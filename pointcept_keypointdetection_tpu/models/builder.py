"""Model registries.

Parity surface: `pointcept/models/builder.py` — ``MODELS``/``MODULES``
registries and ``build_model``.
"""

from ..utils.registry import Registry

MODELS = Registry("models")
MODULES = Registry("modules")


def build_model(cfg, **default_args):
    return MODELS.build(cfg, **default_args)
