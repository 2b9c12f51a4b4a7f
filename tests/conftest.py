import os

# Run the test suite on CPU with 8 virtual devices so multi-device sharding
# paths are exercised without TPU hardware (see SURVEY.md §4).  The container's
# sitecustomize pre-registers the axon TPU backend before conftest runs, so the
# platform must be forced via jax.config (env vars alone are too late).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
