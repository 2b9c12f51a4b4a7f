"""Benchmark: PTv3 semseg forward throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: full-size PTv3 (reference-default depths/channels/heads) over a
ScanNet-scale synthetic scene — 102,400 padded points, bf16 features, one
TPU chip.

Timing method: the forward is jitted with a scalar "salt" folded into the
input (so repeated calls can't be deduplicated) and returns a scalar, which
is fetched to force completion — robust against async-dispatch semantics of
experimental backends.  Steady-state time = (t(31 calls) - t(11 calls)) / 20.

``vs_baseline``: the reference publishes no frames/s (BASELINE.md) — the
denominator is our documented estimate of the reference's per-GPU PTv3
inference throughput on ScanNet-size scenes (~8 scenes/s on an A100 with
flash-attn, per upstream PTv3 latency reports).  BASELINE.json's target is
2x per-chip, i.e. vs_baseline >= 2.0.

Resilience: the TPU grant behind the axon relay is sometimes UNAVAILABLE for
minutes at a time (PERF.md pathology 4), and JAX caches a failed backend init
for the life of the process.  So the measurement runs in a CHILD process; the
parent retries with backoff on backend-unavailable failures, falls back to a
CPU measurement as a last resort, and ALWAYS prints the JSON line (round 1
lost its official number to an rc=1 exit with no JSON).
"""

import functools
import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_SCENES_PER_SEC = 8.0
_CHILD_ENV = "PKT_BENCH_CHILD"

# Error signatures that mean "the chip grant is wedged / relay down — retry".
_RETRYABLE = (
    "UNAVAILABLE",
    "Unable to initialize backend",
    "DEADLINE_EXCEEDED",
    "RESOURCE_EXHAUSTED",
    "Socket closed",
    "failed to connect",
)


def _emit(scenes_per_sec, unit_suffix=""):
    patch = os.environ.get("PKT_BENCH_PATCH", "1024")
    stem = os.environ.get("PKT_BENCH_STEM", "5")
    attn = os.environ.get("PKT_BENCH_ATTN", "pallas")
    workload = f"patch {patch}, k={stem} stem, {attn} attn"
    conv = os.environ.get("PKT_CONV_IMPL")
    if conv and conv != "auto":
        workload += f", {conv} conv"
    print(
        json.dumps(
            {
                "metric": "ptv3_semseg_forward_scenes_per_sec",
                "value": round(scenes_per_sec, 3),
                "unit": f"scenes/s (102k pts/scene, reference workload: {workload}, 1 chip)"
                + unit_suffix,
                "vs_baseline": round(scenes_per_sec / REFERENCE_SCENES_PER_SEC, 3),
            }
        ),
        flush=True,
    )


# Persistent compile cache: the axon remote compiler's compile time scales with
# tensor size (a 102k-point lexsort alone costs ~30s to compile, the full model
# ~30 min) — caching makes every run after the first take seconds.
def _enable_compile_cache():
    import jax

    if jax.default_backend() == "cpu":
        # CPU AOT cache entries embed machine features; stale entries from a
        # different host can SIGILL — only cache device compiles
        return
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _build_workload():
    """(model, variables, point, fwd_fn, meta) — the exact bench forward.

    Shared by the timed measurement and ``forward_cost_analysis`` (the
    tools/project_v5e.py FLOP cross-check)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointcept_keypointdetection_tpu.models import MODELS, PointBatch

    B = int(os.environ.get("PKT_BENCH_B", "1"))  # scenes per forward (batched inference)
    S = int(os.environ.get("PKT_BENCH_S", "102400"))  # points per scene (override for smoke tests)
    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 8.0, (B, S, 3)).astype(np.float32)
    grid = np.floor(coords / 0.02).astype(np.int32)
    valid = np.zeros((B, S), bool)
    for b in range(B):
        _, first = np.unique(
            grid[b, :, 0].astype(np.int64) * 10**8 + grid[b, :, 1] * 10**4 + grid[b, :, 2],
            return_index=True,
        )
        valid[b, first[: min(len(first), S - 64)]] = True
    feat = rng.normal(size=(B, S, 6)).astype(np.float32)
    feat[~valid] = 0

    # Honest reference workload (VERDICT r2 item 2): enc/dec patch size 1024
    # and the k=5 spconv stem exactly as the reference ScanNet config
    # (`/root/reference/configs/scannet/semseg-pt-v3m1-0-base.py:23-27`,
    # stem `point_transformer_v3m1_base.py:485-515`).  Env overrides let the
    # round-2 softened workload (patch 128, k=3 stem) be reproduced.
    patch = int(os.environ.get("PKT_BENCH_PATCH", "1024"))
    stem_k = int(os.environ.get("PKT_BENCH_STEM", "5"))
    # kernel-map join keys need only injectivity; this workload's grids are
    # bounded by 8 m / 0.02 m = 400 < 2^10 per axis (asserted below), so the
    # joins sort single-u32 keys (ops/sparse.kmap_single_lane)
    assert int(grid.max()) < 1024, int(grid.max())
    backbone = dict(
        type="PT-v3m1",
        in_channels=6,
        stride=(2, 2, 2, 2),
        enc_depths=(2, 2, 2, 6, 2),
        enc_channels=(32, 64, 128, 256, 512),
        enc_num_head=(2, 4, 8, 16, 32),
        enc_patch_size=(patch,) * 5,
        dec_depths=(2, 2, 2, 2),
        dec_channels=(64, 64, 128, 256),
        dec_num_head=(4, 4, 8, 16),
        dec_patch_size=(patch,) * 4,
        drop_path=0.0,
        slot_divisors=(1, 4, 16, 64, 128),
        stem_kernel=stem_k,
        kmap_depth=10,
        # Pallas fused patch attention ON the measured path (VERDICT r2
        # item 1); the round-1 "payload not byte-stable" cache concern was
        # disproven in round 2 (PERF.md)
        attn_impl=os.environ.get("PKT_BENCH_ATTN", "pallas"),
        kmap_mode=os.environ.get("PKT_BENCH_KMAP", "direct"),
        chain_cpe0=os.environ.get("PKT_BENCH_CPE0", "direct"),
        stem_conv=os.environ.get("PKT_BENCH_STEMCONV", "cell_packed"),
    )
    # DefaultSegmentorV2 + 20-class head: the reference semseg forward ends
    # in a linear classifier (`models/default.py:94`); earlier rounds
    # measured the bare backbone (64-dim features as "logits") — the head
    # costs ~0.26 GFLOP, <1% of the forward, but the workload should be
    # what the unit string claims
    model = MODELS.build(dict(
        type="DefaultSegmentorV2", backbone=backbone, criteria=(),
        num_classes=20, backbone_out_channels=64,
    ))
    point = PointBatch(
        coord=jnp.asarray(coords.reshape(-1, 3)),
        feat=jnp.asarray(feat.reshape(-1, 6), jnp.bfloat16),
        grid_coord=jnp.asarray(grid.reshape(-1, 3)),
        valid=jnp.asarray(valid.reshape(-1)),
        num_samples=B,
    )
    t0 = time.perf_counter()
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, point, {}
    )
    jax.block_until_ready(variables)
    print(f"# init done in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    if os.environ.get("PKT_BENCH_PARAM_DTYPE", "bfloat16") == "bfloat16":
        # bf16 end-to-end weights: halves parameter HBM traffic; every compute
        # site already casts params to the feature dtype, and norm statistics
        # stay f32 (batch_stats untouched)
        variables = dict(variables)
        variables["params"] = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            variables["params"],
        )

    def fwd_fn(variables, point, salt):
        pt = point.replace(feat=point.feat + salt.astype(point.feat.dtype))
        logits = model.apply(variables, pt, {}, train=False)["seg_logits"]
        return jnp.sum(logits.astype(jnp.float32))

    meta = dict(B=B, S=S, patch=patch, stem_k=stem_k, backbone=backbone)
    return model, variables, point, fwd_fn, meta


def forward_cost_analysis():
    """XLA cost_analysis of the compiled bench forward (flops/bytes totals) —
    the cross-check anchor for tools/project_v5e.py's analytic table."""
    import jax
    import jax.numpy as jnp

    _, variables, point, fwd_fn, _ = _build_workload()
    compiled = jax.jit(fwd_fn).lower(variables, point, jnp.float32(0.0)).compile()
    ca = compiled.cost_analysis()
    return ca[0] if isinstance(ca, (list, tuple)) else ca


def _run_bench():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    model, variables, point, fwd_fn, meta = _build_workload()
    B, S, patch, stem_k, backbone = (
        meta["B"], meta["S"], meta["patch"], meta["stem_k"], meta["backbone"]
    )

    # executable cache: trace+lower+compile once per (source tree, workload),
    # then load the compiled binary in ~seconds — the JAX compilation cache
    # alone still cost ~200 s/run loading large entries through the relay
    from pointcept_keypointdetection_tpu.utils.aot_cache import cached_jit

    t0 = time.perf_counter()
    workload = (
        f"B{B} S{S} patch{patch} stem{stem_k} {backbone['attn_impl']} "
        f"{backbone['kmap_mode']} {backbone['chain_cpe0']} {backbone['stem_conv']} "
        f"conv={os.environ.get('PKT_CONV_IMPL', 'auto')}"
    )
    fwd_scalar = cached_jit(fwd_fn, (variables, point, jnp.float32(0.0)), key_extra=workload)
    float(fwd_scalar(variables, point, jnp.float32(0.0)))  # (compile+)first
    print(f"# forward compile+first in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    def timed(n, base):
        t0 = time.perf_counter()
        outs = [fwd_scalar(variables, point, jnp.float32(base + 1e-6 * i)) for i in range(n)]
        float(outs[-1])  # fetch forces all queued work to complete
        return time.perf_counter() - t0

    t_small = timed(11, 0.0)
    t_large = timed(31, 1.0)
    per_iter = max((t_large - t_small) / 20.0, 1e-9)
    scenes_per_sec = B / per_iter

    backend = jax.default_backend()
    suffix = "" if backend != "cpu" else f" [CPU FALLBACK S={S} — no TPU grant]"
    _emit(scenes_per_sec, suffix)


def _spawn_child(extra_env):
    env = dict(os.environ)
    env[_CHILD_ENV] = "1"
    env.update(extra_env)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        timeout=float(os.environ.get("PKT_BENCH_CHILD_TIMEOUT", "5400")),
    )
    sys.stderr.write(proc.stderr[-4000:])
    json_line = None
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            json_line = line
    return proc.returncode, json_line, proc.stderr


def _maybe_project():
    """--project-v5e / PKT_BENCH_PROJECT=1: print the per-op-class real-
    silicon projection (tools/project_v5e.py) to stderr alongside the
    measured number.  Pure static-shape arithmetic — no device work."""
    if "--project-v5e" not in sys.argv and not os.environ.get("PKT_BENCH_PROJECT"):
        return
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        import project_v5e

        project_v5e.project(out=sys.stderr)
    except Exception as exc:  # noqa: BLE001
        print(f"# v5e projection failed: {exc}", file=sys.stderr)


def main():
    if os.environ.get(_CHILD_ENV):
        _run_bench()
        return

    # PKT_CONV_IMPL=pallas (VERDICT r4 item 9): measure the fused Pallas conv
    # AND the xla default, so the kernel's economics are re-checked for free
    # whenever the backend changes; the env-selected variant is the official
    # JSON line, the other is a stderr comment.
    conv = os.environ.get("PKT_CONV_IMPL")
    if conv and conv not in ("auto", "xla"):
        try:
            rc, other_json, _ = _spawn_child({"PKT_CONV_IMPL": "xla"})
            if rc == 0 and other_json:
                print(f"# comparison [PKT_CONV_IMPL=xla]: {other_json}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            print(f"# xla comparison failed: {exc}", file=sys.stderr)

    deadline = time.time() + float(os.environ.get("PKT_BENCH_RETRY_BUDGET", "1800"))
    backoff = 30.0
    attempt = 0
    while True:
        attempt += 1
        try:
            rc, json_line, stderr = _spawn_child({})
        except subprocess.TimeoutExpired:
            rc, json_line, stderr = 1, None, "child timeout"
        if rc == 0 and json_line:
            print(json_line, flush=True)
            _maybe_project()
            return
        retryable = any(sig in stderr for sig in _RETRYABLE)
        print(
            f"# bench attempt {attempt} failed (rc={rc}, retryable={retryable})",
            file=sys.stderr,
        )
        if not retryable or time.time() + backoff > deadline:
            break
        time.sleep(backoff)
        backoff = min(backoff * 2, 300.0)

    # Last resort: measure on CPU so the round still records an official
    # number (clearly marked), instead of rc=1 with no JSON (round 1's fate).
    # Smaller scene: the full 102k workload takes tens of minutes on CPU.
    print("# falling back to CPU measurement", file=sys.stderr)
    try:
        rc, json_line, _ = _spawn_child(
            {"JAX_PLATFORMS": "cpu", "PKT_BENCH_S": os.environ.get("PKT_BENCH_S", "16384")}
        )
        if rc == 0 and json_line:
            print(json_line, flush=True)
            _maybe_project()
            return
    except Exception as exc:  # noqa: BLE001
        print(f"# CPU fallback failed: {exc}", file=sys.stderr)
    _emit(0.0, " [BENCH FAILED — no backend]")


if __name__ == "__main__":
    main()
