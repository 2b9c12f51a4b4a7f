"""Cross-process (multi-host) host-side collectives.

The TPU replacement for the reference's gloo side process-group
(`pointcept/utils/comm.py:91-198`): host-side numpy accumulators (tester
confusion counts, evaluator records) are reduced across processes with
``multihost_utils.process_allgather``; device-side reductions need nothing —
they run globally under jit over the sharded batch by construction.

Every helper degrades to a no-op in the single-process case, so callers never
branch on world size (same contract as `comm.py:23-28`).
"""

from __future__ import annotations

import jax
import numpy as np


def process_count() -> int:
    try:
        return jax.process_count()
    except RuntimeError:
        return 1


def is_main_process() -> bool:
    try:
        return jax.process_index() == 0
    except RuntimeError:
        return True


def host_allgather(tree):
    """All-gather a pytree of host numpy arrays: each leaf gains a leading
    ``[num_processes]`` axis.  Identity-with-new-axis when single-process."""
    if process_count() == 1:
        return jax.tree_util.tree_map(lambda x: np.asarray(x)[None], tree)
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda x: np.asarray(multihost_utils.process_allgather(np.asarray(x))), tree
    )


def host_allreduce_sum(tree):
    """Sum a pytree of host numpy arrays across processes (reference contract:
    `dist.all_reduce` of metric count tensors, `hooks/evaluator.py:153-156`)."""
    if process_count() == 1:
        return tree
    gathered = host_allgather(tree)
    return jax.tree_util.tree_map(lambda x: x.sum(axis=0), gathered)


def host_allgather_objects(obj):
    """All-gather arbitrary picklables from every process — the reference's
    gloo-side object collective (`comm.all_gather`, `utils/comm.py:103-127`),
    used to join per-process tester records (e.g. InsSeg scene association
    structures).  Two-phase: gather byte sizes, pad to the max, gather bytes.
    Returns a list of ``num_processes`` objects (``[obj]`` single-process)."""
    if process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    data = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = np.asarray(
        multihost_utils.process_allgather(np.array([data.size], np.int64))
    ).reshape(-1)
    cap = int(sizes.max())
    padded = np.zeros(cap, np.uint8)
    padded[: data.size] = data
    gathered = np.asarray(multihost_utils.process_allgather(padded)).reshape(len(sizes), cap)
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes()) for i in range(len(sizes))
    ]


def barrier(name: str = "barrier"):
    """Block until every process arrives (reference `comm.synchronize`)."""
    if process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
