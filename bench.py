"""Benchmark: PTv3 semseg forward throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: PTv3 (reference-default depths/channels/heads, patch 48->dense-eval
patch table below) over a ScanNet-scale synthetic scene batch — 102,400 padded
points per scene (~real ScanNet 0.02 m grid scenes), bf16 feats, one real TPU
chip via jit; steady-state scenes/s over several iterations.

``vs_baseline``: the reference publishes no frames/s (BASELINE.md) — the
denominator is our documented estimate of the reference's per-GPU PTv3
inference throughput on ScanNet-size scenes (~8 scenes/s on an A100 with
flash-attn per upstream PTv3 paper Table 10 latency ≈ 120 ms/scene).  The
BASELINE.json target is 2x per-chip, i.e. vs_baseline >= 2.0 is the goal.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_SCENES_PER_SEC = 8.0


def main():
    import jax

    from pointcept_keypointdetection_tpu.engines.common import build_point_batch
    from pointcept_keypointdetection_tpu.models import MODELS

    B, S = 1, 102_400
    rng = np.random.default_rng(0)
    # synthetic ScanNet-like scene: ~70% fill rate of the slot
    coords = rng.uniform(0, 8.0, (B, S, 3)).astype(np.float32)
    grid = np.floor(coords / 0.02).astype(np.int32)
    valid = np.zeros((B, S), bool)
    for b in range(B):
        _, first = np.unique(
            grid[b, :, 0].astype(np.int64) * 10**8 + grid[b, :, 1] * 10**4 + grid[b, :, 2],
            return_index=True,
        )
        n_valid = min(len(first), S - 64)
        valid[b, first[:n_valid]] = True
    feat = rng.normal(size=(B, S, 6)).astype(np.float32)
    feat[~valid] = 0

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
        stem_kernel=5,
    )
    model = MODELS.build(
        dict(type="DefaultSegmentor", backbone=backbone, criteria=())
    )

    from pointcept_keypointdetection_tpu.models import PointBatch

    point = PointBatch(
        coord=jax.numpy.asarray(coords.reshape(-1, 3)),
        feat=jax.numpy.asarray(feat.reshape(-1, 6), jax.numpy.bfloat16),
        grid_coord=jax.numpy.asarray(grid.reshape(-1, 3)),
        valid=jax.numpy.asarray(valid.reshape(-1)),
        num_samples=B,
    )
    import functools
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, point, {}
    )

    @jax.jit
    def forward(params, point):
        return model.apply(params, point, {}, train=False)["seg_logits"]

    out = forward(variables, point)
    out.block_until_ready()  # compile
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(variables, point)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    scenes_per_sec = B * iters / dt

    print(
        json.dumps(
            {
                "metric": "ptv3_semseg_forward_scenes_per_sec",
                "value": round(scenes_per_sec, 3),
                "unit": "scenes/s (102k pts/scene, 1 chip)",
                "vs_baseline": round(scenes_per_sec / REFERENCE_SCENES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
