"""Seeding and environment helpers.

Parity surface: `pointcept/utils/env.py` — random seed derivation and global
determinism seeding.  On the TPU build, model/data randomness flows through
explicit ``jax.random`` keys, so "set_seed" seeds host-side numpy/python RNGs
(used by data transforms) and returns the root jax PRNG key.
"""

from __future__ import annotations

import os
import random
import time

import numpy as np


def get_random_seed() -> int:
    return (os.getpid() + int(time.time() * 1000) + int.from_bytes(os.urandom(2), "big")) % (2**32 - 1)


def set_seed(seed=None):
    """Seed python/numpy and return a root jax PRNG key for device randomness."""
    import jax

    if seed is None:
        seed = get_random_seed()
    random.seed(seed)
    np.random.seed(seed % (2**32 - 1))
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)
