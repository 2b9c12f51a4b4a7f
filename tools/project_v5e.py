"""Per-op-class real-silicon (v5e) projection of the bench forward.

VERDICT r4 item 3: the relayed bench chip prices ELEMENT TOUCHES
~100-1000x below physical v5e for bandwidth-bound ops (PERF.md "Backend
calibration"), so the measured 4.67 scenes/s says little about real
hardware.  This module converts that narrative into an auditable table:
for every op class in the bench forward (102,400-point PTv3, patch 1024,
k=5 cell-packed stem, 4 serialization orders — the exact bench.py
workload), it derives

  * element touches (bytes that must move through HBM at least once),
  * MXU FLOPs,
  * the projected v5e time  max(bytes / BW_eff, flops / TF_eff),

from the architecture's static shapes, with every count formula written
out next to its op.  Sorts get TWO projections (the binding uncertainty):
a bitonic-network model (log2(n)*(log2(n)+1)/2 full passes — how XLA:TPU
lowers sort today) and a 4-pass radix bound (what a tuned kernel acheives);
the summary reports the total as a [pessimistic, optimistic] range.

Rate sheet (documented assumptions, edit here):
  * HBM bandwidth 819 GB/s x 0.70 utilization (streaming/fused elementwise,
    wide-row gathers, segment reductions).
  * MXU 197 bf16 TFLOP/s x 0.50 utilization (conv/attention contractions at
    these channel widths; f32 accumulate).
  * narrow (sub-32B-row) gathers: 2 ns/row (latency-bound, 8-way banked).
  * fixed per-op dispatch overhead 3 us (XLA fusion count is far lower than
    this table's op-class count, so this overcounts — conservative).

Cross-checks: ``--flops`` compares the analytic FLOP total against XLA's
``compiled.cost_analysis()`` for the same jitted forward on CPU.

Usage:  python tools/project_v5e.py [--flops]
        (also imported by bench.py --project-v5e / PKT_BENCH_PROJECT=1)
"""

from __future__ import annotations

import math
import sys
from dataclasses import dataclass
from typing import List

# ---- rate sheet -----------------------------------------------------------
BW = 819e9 * 0.70  # effective HBM bytes/s
TF = 197e12 * 0.50  # effective bf16 MXU flop/s
NARROW_GATHER_NS = 2.0  # per sub-32B row
OP_OVERHEAD_S = 3e-6
BF16 = 2

# ---- the bench workload (mirrors bench.py exactly) ------------------------
N0 = 102_400
PATCH = 1024
DIVISORS = (1, 4, 16, 64, 128)
ENC_C = (32, 64, 128, 256, 512)
DEC_C = (64, 64, 128, 256)
ENC_D = (2, 2, 2, 6, 2)
DEC_D = (2, 2, 2, 2)
IN_C = 6
ORDERS = 4
STEM_K = 5  # -> cell-packed over 2x2x2 subcells
MLP_RATIO = 4


def _levels():
    """Per-stage slot capacity: slot0/divisor rounded up to a patch multiple
    (point_transformer_v3.py stage_cap)."""
    out = []
    for d in DIVISORS:
        cap = max(N0 // d, PATCH)
        out.append(-(-cap // PATCH) * PATCH)
    return out


# Measured relay-chip ms for op classes with microbench coverage
# (tools/profile_ops.py on the live backend, r5 session: `kmap3sl conv
# attn1024`, plus PERF.md r4 for the stem).  The measured/projected ratio IS
# the relay's element-touch-pricing distortion, op class by op class.
RELAY_MEASURED_MS = {
    "kmap join L0 (n=102400)": (17.5, "kmap3sl microbench @102k"),
    "stem cell-packed conv k=5": (50.0, "PERF.md r4 stem attack"),
    "enc0 xCPE conv x2": (2 * 12.1, "conv microbench c=32 x2"),
    "dec0 xCPE conv x2": (2 * 8.9, "conv microbench c=64 x2"),
    "enc0 patch attention x2": (0.4, "attn1024 pallas microbench (~0.2/blk)"),
}


@dataclass
class OpClass:
    name: str
    count: int
    bytes_each: float  # element touches per instance
    flops_each: float
    note: str = ""

    @property
    def bytes(self):
        return self.count * self.bytes_each

    @property
    def flops(self):
        return self.count * self.flops_each

    def seconds(self, sort_passes=None):
        t = max(self.bytes / BW, self.flops / TF) + self.count * OP_OVERHEAD_S
        return t


def _sort_bytes(n, row_bytes, passes):
    return n * row_bytes * passes


def _bitonic_passes(n):
    k = max(math.ceil(math.log2(max(n, 2))), 1)
    return k * (k + 1) / 2


def build_table(sort_model: str = "bitonic") -> List[OpClass]:
    Ns = _levels()
    ops: List[OpClass] = []

    def sort_passes(n):
        return _bitonic_passes(n) if sort_model == "bitonic" else 4.0

    # -- serialization: 4-order encode + argsort at L0 ---------------------
    # encode: read grid_coord (3x s32) write u64 code, bit-twiddling
    ops.append(OpClass(
        "serialize encode x4 orders", ORDERS, N0 * (12 + 8), 0,
        "grid->Morton/Hilbert bit ops; bandwidth only",
    ))
    # argsort (u64 key + u32 payload); order-0 z sort doubles as the L0
    # kernel-map voxel sort (reuse_perm), so 4 sorts cover both uses
    ops.append(OpClass(
        "serialize argsort x4 orders", ORDERS,
        _sort_bytes(N0, 12, sort_passes(N0)), 0,
        f"{sort_model} model, {sort_passes(N0):.0f} passes of 12B rows",
    ))
    # inverse-permutation scatter per order
    ops.append(OpClass(
        "serialize inverse scatter x4", ORDERS, N0 * 8, 0, "iota scatter by order",
    ))

    # -- stem: parent cell index + cell-packed k=5 conv --------------------
    # coarse k=3 join at the 2x2x2-cell level (~N/4 occupied cells at this
    # density) + subvoxel table build (one [Ncell, 8] scatter)
    ncell = N0 // 4
    ops.append(OpClass(
        "stem parent-cell join (27-offset, cell level)", 1,
        _sort_bytes(28 * ncell, 8, sort_passes(28 * ncell)) + ncell * 8 * 4, 0,
        "sort-merge join of 27 query offsets + cell table scatter",
    ))
    # cell-packed conv: gather 27 cell rows of 8*Cin bf16 per point, then
    # einsum [N, 216, Cin] x [parity, 216, Cin, 8*Cout]
    nsub = 8
    gathered = N0 * 27 * nsub * IN_C * BF16
    flops = 2 * N0 * 27 * nsub * IN_C * nsub * ENC_C[0]
    ops.append(OpClass(
        "stem cell-packed conv k=5", 1, gathered + N0 * ENC_C[0] * BF16, flops,
        "27-cell gather + parity-expanded MXU contraction (8x redundant FLOPs)",
    ))

    # -- per-level kernel-map joins (xCPE k=3 maps) ------------------------
    # L0 reuses the serialization sort for its voxel index; the join itself
    # still sorts 27 query offsets against the index: ~28*N rows of u32+u32
    for s, n in enumerate(Ns):
        rows = 28 * n
        ops.append(OpClass(
            f"kmap join L{s} (n={n})", 1,
            _sort_bytes(rows, 8, sort_passes(rows)) + n * 27 * 4, 0,
            "single-lane sort-merge join + [N,27] map write",
        ))

    # -- pooling / unpooling ----------------------------------------------
    for s in range(1, len(Ns)):
        n_in, n_out, c_in, c_out = Ns[s - 1], Ns[s], ENC_C[s - 1], ENC_C[s]
        # code>>3 cluster: segment-reduce features + coords, one sort of the
        # pooled codes per order to re-serialize the coarse level
        ops.append(OpClass(
            f"pool L{s - 1}->L{s} reduce+proj", 1,
            n_in * c_in * BF16 + n_out * c_out * BF16,
            2 * n_in * c_in * c_out,
            "segment max/mean + Dense proj",
        ))
        ops.append(OpClass(
            f"pool L{s} re-sort x{ORDERS}", ORDERS,
            _sort_bytes(n_out, 12, sort_passes(n_out)), 0, "",
        ))
    for s in reversed(range(len(Ns) - 1)):
        n_coarse, n_fine, c = Ns[s + 1], Ns[s], DEC_C[s]
        c_coarse = DEC_C[s + 1] if s + 1 < len(DEC_C) else ENC_C[-1]
        ops.append(OpClass(
            f"unpool L{s + 1}->L{s}", 1,
            n_coarse * c_coarse * BF16 + 2 * n_fine * c * BF16,
            2 * n_coarse * c_coarse * c + 2 * n_fine * ENC_C[s] * c,
            "parent-row gather + proj + skip proj",
        ))

    # -- transformer blocks ------------------------------------------------
    stages = [("enc", s, Ns[s], ENC_C[s], ENC_D[s]) for s in range(len(Ns))] + [
        ("dec", s, Ns[s], DEC_C[s], DEC_D[s]) for s in range(len(DEC_C))
    ]
    for kind, s, n, c, depth in stages:
        if depth == 0:
            continue
        # xCPE: k=3 submanifold conv (im2col gather of 27 wide rows + matmul)
        ops.append(OpClass(
            f"{kind}{s} xCPE conv x{depth}", depth,
            27 * n * c * BF16 + n * c * BF16,
            2 * n * 27 * c * c,
            "27-row gather + [N*27,C]x[27C? folded] matmul",
        ))
        # qkv + proj + MLP dense
        dense_flops = 2 * n * c * c * (3 + 1) + 2 * n * c * (MLP_RATIO * c) * 2
        ops.append(OpClass(
            f"{kind}{s} dense (qkv/proj/mlp) x{depth}", depth,
            n * c * BF16 * 8, dense_flops, "",
        ))
        # blocked attention within patches: qk^T + softmax + av
        attn_flops = 4 * n * PATCH * (c // 1)
        ops.append(OpClass(
            f"{kind}{s} patch attention x{depth}", depth,
            3 * n * c * BF16 + n * PATCH * BF16,  # qkv read + score tile traffic
            attn_flops,
            f"patch {PATCH}, flash-style tiling (scores stay in VMEM)",
        ))
        # 2 LayerNorms + residuals
        ops.append(OpClass(
            f"{kind}{s} norms/residuals x{depth}", depth, 6 * n * c * BF16, 0, "",
        ))
        # per-block order permutation gather (serialized attention re-orders
        # features by order[i % 4])
        ops.append(OpClass(
            f"{kind}{s} order gather x{depth}", depth, 2 * n * c * BF16 + n * 4, 0, "",
        ))

    # -- 20-class seg head (part of the measured bench workload since r5:
    # bench.py builds DefaultSegmentorV2 with num_classes=20) --------------
    ops.append(OpClass("seg head 64->20", 1, N0 * (64 + 20) * BF16, 2 * N0 * 64 * 20, ""))
    return ops


def project(verbose=True, out=sys.stderr):
    rows = []
    totals = {}
    for sort_model in ("bitonic", "radix4"):
        table = build_table(sort_model)
        total_s = sum(op.seconds() for op in table)
        totals[sort_model] = total_s
        if sort_model == "bitonic":
            rows = table
    if verbose:
        print("# v5e projection of the bench forward (rates in module docstring)", file=out)
        print(
            f"# {'op class':44s} {'bytes(MB)':>10s} {'GFLOP':>8s} {'ms':>8s} {'relay ms':>9s}",
            file=out,
        )
        for op in sorted(rows, key=lambda o: -o.seconds()):
            relay = RELAY_MEASURED_MS.get(op.name)
            relay_s = f"{relay[0]:9.1f}" if relay else " " * 9
            print(
                f"# {op.name:44s} {op.bytes / 1e6:10.2f} {op.flops / 1e9:8.2f} "
                f"{op.seconds() * 1e3:8.3f} {relay_s}  {op.note}",
                file=out,
            )
        for sm, t in totals.items():
            print(
                f"# TOTAL [{sm} sorts]: {t * 1e3:.1f} ms/scene = "
                f"{1.0 / t:.1f} scenes/s = {1.0 / t / 8.0:.2f}x the 8/s baseline",
                file=out,
            )
    return {sm: 1.0 / t for sm, t in totals.items()}


def crosscheck_flops():
    """Compare the analytic FLOP total against XLA cost_analysis (CPU)."""
    analytic = sum(op.flops for op in build_table())
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("PKT_BENCH_S", "102400")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    stats = bench.forward_cost_analysis()
    xla = stats.get("flops", 0)
    print(f"# analytic GFLOP: {analytic / 1e9:.1f} (2 flops/MAC convention)")
    print(f"# XLA cost_analysis GFLOP: {xla / 1e9:.1f} (1 flop/MAC convention)")
    # measured r5 (CPU compile, PKT_BENCH_ATTN=xla): 492.6 vs 237.5 —
    # exactly the MAC-convention factor 2 apart (492.6/2 = 246.3, within 4%)
    print(f"# ratio analytic/(2*xla): {analytic / max(2 * xla, 1):.3f} (1.0 = exact)")
    return analytic, stats


if __name__ == "__main__":
    project(out=sys.stdout)
    if "--flops" in sys.argv:
        crosscheck_flops()
