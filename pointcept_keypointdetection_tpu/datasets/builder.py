"""Dataset registry + loader construction.

Parity surface: `pointcept/datasets/builder.py` (DATASETS registry,
``build_dataset``).
"""

from ..utils.registry import Registry

DATASETS = Registry("datasets")


def build_dataset(cfg, **default_args):
    return DATASETS.build(cfg, **default_args)
