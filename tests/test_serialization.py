"""Bit-for-bit parity of the serialization codecs against reference goldens.

Goldens were produced by tools/generate_serialization_goldens.py running the
reference torch implementation (z-order LUT + Skilling Hilbert).
"""

import os

import numpy as np
import pytest

import pointcept_keypointdetection_tpu.ops as ops
from pointcept_keypointdetection_tpu.ops.codes import code_to_u64

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("depth", [8, 16])
@pytest.mark.parametrize("order", ["z", "z-trans", "hilbert", "hilbert-trans"])
def test_encode_np_matches_reference(depth, order):
    data = np.load(os.path.join(GOLDEN, f"serialization_d{depth}.npz"))
    code = ops.encode_np(data["coords"], data["batch"], depth=depth, order=order)
    np.testing.assert_array_equal(code, data[f"code_{order}"])


@pytest.mark.parametrize("depth", [8, 16])
@pytest.mark.parametrize("order", ["z", "z-trans", "hilbert", "hilbert-trans"])
def test_encode_device_matches_reference(depth, order):
    import jax.numpy as jnp

    data = np.load(os.path.join(GOLDEN, f"serialization_d{depth}.npz"))
    code = ops.encode(
        jnp.asarray(data["coords"], jnp.int32),
        jnp.asarray(data["batch"], jnp.int32),
        depth=depth,
        order=order,
    )
    np.testing.assert_array_equal(code_to_u64(code), data[f"code_{order}"])


def test_z_order_roundtrip():
    rng = np.random.default_rng(1)
    coords = rng.integers(0, 2**16, size=(256, 3))
    key = ops.z_order_encode_np(coords, depth=16)
    np.testing.assert_array_equal(ops.z_order_decode_np(key, depth=16), coords)


def test_hilbert_roundtrip():
    rng = np.random.default_rng(2)
    coords = rng.integers(0, 2**16, size=(256, 3))
    key = ops.hilbert_encode_np(coords, depth=16)
    np.testing.assert_array_equal(ops.hilbert_decode_np(key, depth=16), coords)


def test_hilbert_locality():
    # consecutive hilbert codes should be adjacent in space (the defining property)
    n = 512
    t = np.arange(n, dtype=np.uint64)
    coords = ops.hilbert_decode_np(t, depth=3)
    step = np.abs(np.diff(coords, axis=0)).sum(axis=1)
    np.testing.assert_array_equal(step, np.ones(n - 1))
