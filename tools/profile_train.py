"""Full-size PTv3 train-step throughput on the live backend (fwd+bwd+adamw).

Same workload and timing protocol as bench.py, but the jitted function is a
complete training step: CE loss over 20 classes, value_and_grad, optax adamw
update. Catches backward-pass pathologies the forward bench can't see."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from pointcept_keypointdetection_tpu.models import MODELS, PointBatch

    B, S = 1, 102_400
    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 8.0, (B, S, 3)).astype(np.float32)
    grid = np.floor(coords / 0.02).astype(np.int32)
    valid = np.zeros((B, S), bool)
    _, first = np.unique(
        grid[0, :, 0].astype(np.int64) * 10**8 + grid[0, :, 1] * 10**4 + grid[0, :, 2],
        return_index=True,
    )
    valid[0, first[: min(len(first), S - 64)]] = True
    feat = rng.normal(size=(B, S, 6)).astype(np.float32)
    feat[~valid] = 0
    segment = rng.integers(0, 20, (B * S,)).astype(np.int32)

    backbone = dict(
        type="PT-v3m1",
        in_channels=6,
        stride=(2, 2, 2, 2),
        enc_depths=(2, 2, 2, 6, 2),
        enc_channels=(32, 64, 128, 256, 512),
        enc_num_head=(2, 4, 8, 16, 32),
        enc_patch_size=(128, 128, 128, 128, 128),
        dec_depths=(2, 2, 2, 2),
        dec_channels=(64, 64, 128, 256),
        dec_num_head=(4, 4, 8, 16),
        dec_patch_size=(128, 128, 128, 128),
        drop_path=0.0,
        slot_divisors=(1, 4, 16, 64, 128),
        stem_kernel=3,
        attn_impl="xla",
    )
    model = MODELS.build(dict(type="DefaultSegmentor", backbone=backbone, criteria=()))
    point = PointBatch(
        coord=jnp.asarray(coords.reshape(-1, 3)),
        feat=jnp.asarray(feat.reshape(-1, 6), jnp.bfloat16),
        grid_coord=jnp.asarray(grid.reshape(-1, 3)),
        valid=jnp.asarray(valid.reshape(-1)),
        num_samples=B,
    )
    seg = jnp.asarray(segment)

    t0 = time.perf_counter()
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, point, {}
    )
    jax.block_until_ready(variables)
    print(f"# init {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    tx = optax.adamw(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, bs, opt, point, salt):
        pt = point.replace(feat=point.feat + salt.astype(point.feat.dtype))

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": bs}, pt, {}, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1), "shuffle": jax.random.PRNGKey(2)},
            )
            logits = out["seg_logits"].astype(jnp.float32)
            w = pt.valid.astype(jnp.float32)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, seg)
            return jnp.sum(ce * w) / jnp.sum(w), mut.get("batch_stats", {})

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    t0 = time.perf_counter()
    params, bs, opt, loss = step(params, bs, opt, point, jnp.float32(0.0))
    print(f"# train-step compile+first {time.perf_counter() - t0:.1f}s loss={float(loss):.3f}", file=sys.stderr)

    def run(n, base):
        nonlocal params, bs, opt
        t0 = time.perf_counter()
        for i in range(n):
            params, bs, opt, loss = step(params, bs, opt, point, jnp.float32(base + 1e-6 * i))
        float(loss)
        return time.perf_counter() - t0

    ts = run(4, 1.0)
    tl = run(12, 2.0)
    per = (tl - ts) / 8
    print(f"train step: {per * 1e3:.0f} ms/step ({1.0 / per:.2f} steps/s), loss={float(loss):.3f}")


if __name__ == "__main__":
    main()
