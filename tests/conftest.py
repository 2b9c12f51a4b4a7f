import os

# Run the test suite on CPU with 8 virtual devices so multi-device sharding
# paths are exercised without TPU hardware (see SURVEY.md §4).  The container's
# sitecustomize pre-registers the axon TPU backend before conftest runs;
# jax.config alone is NOT enough once a real TPU grant is live (tests then
# silently run on the chip: wrong numerics, 1 device, and contention with any
# concurrent bench) — force the env var too, before jax initializes a backend.
import re

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" in flags:
    # normalize a pre-set count to the 8 virtual devices the suite assumes
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+",
                   "--xla_force_host_platform_device_count=8", flags)
    os.environ["XLA_FLAGS"] = flags
else:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
if jax.default_backend() != "cpu" or len(jax.devices()) != 8:
    raise RuntimeError(
        "test suite requires the CPU backend with 8 virtual devices "
        f"(got backend={jax.default_backend()!r}, devices={jax.devices()}); "
        "jax was initialized before conftest could set "
        "XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu "
        "— run tests via pytest from a fresh interpreter"
    )

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
