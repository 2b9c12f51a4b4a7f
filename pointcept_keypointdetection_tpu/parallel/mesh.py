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
    """Device-put a collated numpy batch with data-parallel sharding.

    Flat per-point arrays ([B*S, ...]) and per-sample arrays ([B, ...]) shard
    on dim 0; scalars replicate.  B must be divisible by the data axis.
    """
    data_sharding = local_batch_sharding(mesh)
    rep = replicate(mesh)
    n_data = mesh.shape["data"]
    out = {}
    for key, value in batch.items():
        if key in ("name", "num_samples"):
            continue
        arr = np.asarray(value)
        if arr.dtype == object or arr.dtype.kind in "US":
            continue
        if arr.ndim == 0 or arr.shape[0] % n_data != 0:
            # small per-sample arrays (B < devices) replicate
            out[key] = jax.device_put(arr, rep)
        else:
            out[key] = jax.device_put(arr, data_sharding)
    if "num_samples" in batch:
        out["num_samples"] = batch["num_samples"]
    return out
