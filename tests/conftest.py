import os

# Run the test suite on CPU with 8 virtual devices so multi-device sharding
# paths are exercised without TPU hardware (see SURVEY.md §4).  The container's
# sitecustomize pre-registers the axon TPU backend before conftest runs;
# jax.config alone is NOT enough once a real TPU grant is live (tests then
# silently run on the chip: wrong numerics, 1 device, and contention with any
# concurrent bench) — force the env var too, before jax initializes a backend.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_xla_caches():
    """Free compiled executables after every test module.

    A single long pytest process accumulates hundreds of XLA CPU
    compilations and sporadically segfaults inside backend_compile_and_load
    (observed on jax 0.8.x CPU after ~250 live executables; each affected
    test passes standalone).  Dropping the jit caches between modules keeps
    the live-executable count bounded so a bare ``pytest tests/`` is safe;
    scripts/run_tests.sh remains the belt-and-braces per-file runner.
    """
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
