"""Device mesh + sharding helpers (the communication plane).

The TPU replacement for the reference's NCCL/gloo stack
(`pointcept/utils/comm.py`, `engines/launch.py`): instead of 1 process/GPU +
DDP allreduce, a single program pjit-shards the padded batch over a ``data``
mesh axis; XLA inserts the gradient psums.  Multi-host extends the same mesh
over processes via ``jax.distributed`` (each process feeds its local shard).

Axes:
* ``data`` — batch samples (slot groups). Replaces DDP.
* ``model`` — reserved for tensor-parallel sharding of wide layers and for
  map-block partitioning in the SLAM stage (size 1 for pure DP).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: Optional[int] = None, model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def local_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for flat [B*S, ...] point arrays: split over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Build globally-sharded device arrays from a collated numpy batch.

    Flat per-point arrays ([B*S, ...]) and per-sample arrays ([B, ...]) shard
    on dim 0; scalars replicate.  B must be divisible by the data axis.

    Single-process: plain ``device_put`` with a NamedSharding.  Multi-process
    (``jax.distributed``): each process's dataloader yields only its LOCAL
    shard (engines/train.py passes num_shards/shard_id), and
    ``jax.make_array_from_process_local_data`` assembles the global array —
    ``device_put`` of local data against a global sharding is wrong there
    (it would treat the local shard as the full global batch).
    """
    data_sharding = local_batch_sharding(mesh)
    rep = replicate(mesh)
    n_data = mesh.shape["data"]
    multiproc = jax.process_count() > 1
    if multiproc:
        # data-axis extent owned by this process
        n_local_data = mesh.local_mesh.shape["data"]
    out = {}
    for key, value in batch.items():
        if key in ("name", "num_samples"):
            continue
        arr = np.asarray(value)
        if arr.dtype == object or arr.dtype.kind in "US":
            continue
        if not multiproc:
            if arr.ndim == 0 or arr.shape[0] % n_data != 0:
                # small per-sample arrays (B < devices) replicate
                out[key] = jax.device_put(arr, rep)
            else:
                out[key] = jax.device_put(arr, data_sharding)
        else:
            if arr.ndim == 0:
                out[key] = jax.make_array_from_process_local_data(rep, arr)
            else:
                assert arr.shape[0] % n_local_data == 0, (
                    f"batch['{key}'] dim0 {arr.shape[0]} not divisible by "
                    f"local data-axis size {n_local_data} (multi-process "
                    f"batches cannot replicate per-sample arrays)"
                )
                out[key] = jax.make_array_from_process_local_data(data_sharding, arr)
    if "num_samples" in batch:
        # global sample count: each process's loader yields its local share
        ns = batch["num_samples"]
        out["num_samples"] = ns * jax.process_count() if multiproc else ns
    return out


def psum_if_bound(x, axis: str = "data"):
    """``lax.psum(x, axis)`` when ``axis`` is bound (i.e. inside a
    ``jax.shard_map`` over the mesh), identity otherwise.

    Lets batch-statistic sites (MaskedBatchNorm, PDNorm, CAC class centers)
    compute GLOBAL statistics both under plain GSPMD jit (where the sharded
    reduction is already global) and under the shard_map train step (where
    reductions are per-shard unless psum'd) — the SyncBN-equivalence contract
    (reference `engines/train.py:256-257`) holds on both paths."""
    try:
        return jax.lax.psum(x, axis)
    except NameError:  # axis not bound: plain jit / eager
        return x
