"""Generate golden serialization codes from the reference implementation.

Runs the reference's torch codecs (read-only from /root/reference) on random
coordinates and stores inputs + expected codes as small .npy files under
tests/golden/.  Our JAX/numpy codecs are then asserted bit-for-bit equal —
the serialization order defines PTv3's behavior, so parity matters.

Usage: python tools/generate_serialization_goldens.py
"""

import os
import sys

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def _load_module(name, path):
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    import torch

    # Load the codec modules directly from file paths — the reference package
    # __init__ chain needs CUDA deps we don't have (and don't want).
    ser = os.path.join(REF, "pointcept/models/utils/serialization")
    _load_module("ref_z_order", os.path.join(ser, "z_order.py"))
    _load_module("ref_hilbert", os.path.join(ser, "hilbert.py"))
    default_src = open(os.path.join(ser, "default.py")).read()
    default_src = (
        default_src.replace("from .z_order import", "from ref_z_order import")
        .replace("from .hilbert import", "from ref_hilbert import")
    )
    import types

    mod = types.ModuleType("ref_default")
    exec(compile(default_src, "ref_default", "exec"), mod.__dict__)
    encode = mod.encode

    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(42)
    n = 512
    for depth in (8, 16):
        coords = rng.integers(0, 2**depth, size=(n, 3), dtype=np.int64)
        batch = rng.integers(0, 4, size=(n,), dtype=np.int64)
        record = {"coords": coords, "batch": batch}
        for order in ("z", "z-trans", "hilbert", "hilbert-trans"):
            code = encode(
                torch.from_numpy(coords), torch.from_numpy(batch), depth=depth, order=order
            )
            record[f"code_{order}"] = code.numpy().astype(np.uint64)
        np.savez(os.path.join(OUT, f"serialization_d{depth}.npz"), **record)
        print(f"wrote serialization_d{depth}.npz")


if __name__ == "__main__":
    main()
