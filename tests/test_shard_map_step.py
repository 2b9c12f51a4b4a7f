"""shard_map train step (VERDICT r4 item 4).

Under plain GSPMD batch sharding, XLA cannot prove the batch-prefixed
serialization sort keys are sample-local and inserts per-sort all-gathers
(~3.2 MB/step at dryrun scale, ~100 MB/step at production scale — PERF.md
r4).  The shard_map train step runs the model body per data-shard, making
sample-locality manifest: the sort all-gathers disappear and the only
inter-device traffic left is the gradient pmean + the psum'd batch-norm
statistics (SyncBN contract, models/norm.py).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from __graft_entry__ import _collective_stats
from pointcept_keypointdetection_tpu.engines.defaults import default_config_parser
from pointcept_keypointdetection_tpu.engines.train import TRAINERS
from pointcept_keypointdetection_tpu.parallel.mesh import shard_batch


def _build(tmp_path, name, shard_map_model):
    cfg = default_config_parser(
        "configs/synthetic/semseg-spunet-mini.py",
        {
            "save_path": f"{tmp_path}/{name}",
            "batch_size": 8,
            "eval_epoch": 1,
            "shard_map_model": shard_map_model,
        },
    )
    return TRAINERS.build({"type": "DefaultTrainer", "cfg": cfg})


def test_shard_map_step_eliminates_sort_allgathers(tmp_path):
    import jax

    tr_g = _build(tmp_path, "gspmd", False)
    tr_s = _build(tmp_path, "smap", True)
    assert int(tr_s.mesh.shape["data"]) == 8  # conftest's 8 virtual devices

    batch_np = next(iter(tr_g.train_loader))
    batch = shard_batch(batch_np, tr_g.mesh)
    ns = int(batch.pop("num_samples"))
    assert ns == 8

    # --- collective footprint (the deliverable) -------------------------
    hlo_g = tr_g._train_step.lower(tr_g.state, batch, ns).compile().as_text()
    hlo_s = tr_s._train_step.lower(tr_s.state, batch, ns).compile().as_text()
    sizes_g, counts_g = _collective_stats(hlo_g)
    sizes_s, counts_s = _collective_stats(hlo_s)
    # GSPMD leaks sort all-gathers; shard_map must not
    assert sizes_g["all-gather"] > 0, (sizes_g, counts_g)
    assert counts_s["all-gather"] == 0, (sizes_s, counts_s)
    assert counts_s["all-to-all"] == 0, (sizes_s, counts_s)
    # gradients still reduce: all-reduce volume at least the parameter bytes
    param_bytes = sum(
        int(np.prod(p.shape)) * p.dtype.itemsize
        for p in jax.tree_util.tree_leaves(tr_s.state.params)
    )
    assert sizes_s["all-reduce"] >= param_bytes, (sizes_s["all-reduce"], param_bytes)

    # --- numerics: same batch, equivalent step --------------------------
    # (losses are not bit-identical by design: GSPMD computes the global
    # masked mean, shard_map the DDP-style mean of per-shard means)
    _, metrics_g = tr_g._train_step(tr_g.state, batch, ns)
    _, metrics_s = tr_s._train_step(tr_s.state, batch, ns)
    loss_g = float(metrics_g["loss"])
    loss_s = float(metrics_s["loss"])
    assert np.isfinite(loss_g) and np.isfinite(loss_s)
    assert abs(loss_g - loss_s) / max(loss_g, 1e-6) < 0.05, (loss_g, loss_s)


def test_shard_map_falls_back_on_indivisible_batch(tmp_path):
    """num_samples not divisible by the data axis -> GSPMD path, still runs."""
    tr = _build(tmp_path, "odd", True)
    batch_np = next(iter(tr.train_loader))
    # drop one sample slot to make ns=7 (not divisible by 8)
    slot = tr.cfg.slot_size
    batch7 = {}
    for k, v in batch_np.items():
        arr = np.asarray(v)
        if arr.ndim > 0 and arr.shape[0] == 8 * slot:
            batch7[k] = arr[: 7 * slot]
        elif arr.ndim > 0 and arr.shape[0] == 8:
            batch7[k] = arr[:7]
        else:
            batch7[k] = v
    batch7["num_samples"] = 7
    batch = shard_batch(batch7, tr.mesh)
    ns = int(batch.pop("num_samples"))
    assert ns == 7
    _, metrics = tr._train_step(tr.state, batch, ns)
    assert np.isfinite(float(metrics["loss"]))


def test_grad_compression_halves_allreduce(tmp_path):
    """grad_compress="bf16" (the reference's fp16 DDP comm-hook analogue,
    `engines/defaults.py:39-42`) compresses the gradient pmean: all-reduce
    volume drops ~2x and the step still trains."""
    import jax

    cfg = default_config_parser(
        "configs/synthetic/semseg-spunet-mini.py",
        {
            "save_path": f"{tmp_path}/gc",
            "batch_size": 8,
            "eval_epoch": 1,
            "shard_map_model": True,
            "grad_compress": "bf16",
        },
    )
    tr = TRAINERS.build({"type": "DefaultTrainer", "cfg": cfg})
    batch_np = next(iter(tr.train_loader))
    batch = shard_batch(batch_np, tr.mesh)
    ns = int(batch.pop("num_samples"))

    # Inspect the LOWERED (backend-independent) IR: the gradient all-reduces
    # must be bf16.  (The compiled CPU module upcasts bf16 collectives to f32
    # during legalization — the wire-width win is a TPU property, so the
    # compiled-bytes assertion lives at the IR level.)
    txt = tr._train_step.lower(tr.state, batch, ns).as_text().splitlines()
    bf16 = f32 = 0
    for i, line in enumerate(txt):
        if '"stablehlo.all_reduce"' not in line:
            continue
        for j in range(i, min(i + 12, len(txt))):
            if "}) : (tensor<" in txt[j]:
                if "bf16" in txt[j]:
                    bf16 += 1
                elif "f32" in txt[j]:
                    f32 += 1
                break
    n_param_leaves = len(jax.tree_util.tree_leaves(tr.state.params))
    assert bf16 >= n_param_leaves, (bf16, f32, n_param_leaves)

    _, metrics = tr._train_step(tr.state, batch, ns)
    assert np.isfinite(float(metrics["loss"]))
