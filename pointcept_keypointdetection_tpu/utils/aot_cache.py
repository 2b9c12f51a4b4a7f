"""On-disk EXECUTABLE cache: jit once, load the compiled binary forever.

The compile-time pathology chain on the bench backend (PERF.md):
* compile time scales with tensor size (a full-size model is minutes),
* the JAX persistent *compilation* cache fixes recompiles but loads large
  entries pathologically slowly through the relay (~200 s for the bench
  forward even on a warm cache),
* so every user of this framework ate minutes before the first step.

``jax.experimental.serialize_executable`` round-trips the backend's
compiled executable in MILLISECONDS (measured: 0.6 MB toy program,
serialize 1.6 ms / load 2.4 ms; the full bench forward ~seconds).  This
module wraps it in a keyed on-disk cache: the key hashes the package
source tree, jax version, backend, argument avals, and a caller string —
any code or workload change invalidates; any load failure falls back to a
normal jit compile and repopulates.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Callable, Sequence

_DEFAULT_DIR = os.environ.get("PKT_EXE_CACHE", "/root/.jax_cache_exe")


def _source_tree_hash() -> str:
    """Content hash of every .py file in the package (plus this repo's
    bench/entry scripts) — cheap (~25k LoC) and exact."""
    import pointcept_keypointdetection_tpu as pkg

    root = os.path.dirname(os.path.abspath(pkg.__file__))
    repo = os.path.dirname(root)
    h = hashlib.sha256()
    files = []
    for base in (root,):
        for dirpath, _dirnames, filenames in os.walk(base):
            for f in filenames:
                if f.endswith(".py"):
                    files.append(os.path.join(dirpath, f))
    for extra in ("bench.py", "__graft_entry__.py"):
        p = os.path.join(repo, extra)
        if os.path.exists(p):
            files.append(p)
    for f in sorted(files):
        h.update(f.encode())
        with open(f, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()


def _arg_sig(args: Sequence[Any]) -> str:
    import jax

    parts = []
    for leaf in jax.tree_util.tree_leaves(args):
        x = leaf
        shape = getattr(x, "shape", ())
        dtype = getattr(x, "dtype", type(x).__name__)
        parts.append(f"{shape}:{dtype}")
    return ";".join(parts)


def cached_jit(fn: Callable, example_args: tuple, key_extra: str = "",
               cache_dir: str = _DEFAULT_DIR, verbose: bool = True):
    """Return a callable equivalent to ``jax.jit(fn)`` specialized to
    ``example_args``' shapes, loading the compiled executable from disk when
    the (source tree, jax version, backend, arg signature, key_extra) key
    matches a previous run."""
    import jax

    backend = jax.default_backend()
    if backend == "cpu":
        # CPU executables embed host machine features; not worth the risk
        return jax.jit(fn)
    key_src = "|".join(
        [jax.__version__, backend, _source_tree_hash(), _arg_sig(example_args), key_extra]
    )
    key = hashlib.sha256(key_src.encode()).hexdigest()[:32]
    path = os.path.join(cache_dir, f"exe_{key}.pkl")
    if os.path.exists(path):
        try:
            from jax.experimental import serialize_executable as se

            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            loaded = se.deserialize_and_load(payload, in_tree, out_tree)
            if verbose:
                print(f"# aot_cache: loaded executable {path}", flush=True)
            return loaded
        except Exception as exc:  # noqa: BLE001 — any failure -> recompile
            if verbose:
                print(f"# aot_cache: load failed ({exc}); recompiling", flush=True)
    compiled = jax.jit(fn).lower(*example_args).compile()
    try:
        from jax.experimental import serialize_executable as se

        payload, in_tree, out_tree = se.serialize(compiled)
        os.makedirs(cache_dir, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, path)
        if verbose:
            print(f"# aot_cache: saved executable {path} ({os.path.getsize(path)/1e6:.1f} MB)", flush=True)
    except Exception as exc:  # noqa: BLE001
        if verbose:
            print(f"# aot_cache: save failed ({exc})", flush=True)
    return compiled
