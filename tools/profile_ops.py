"""Micro-profiles of forward-pass building blocks on the live backend.

Times candidate optimizations before committing to them (PERF.md levers):
f32 vs bf16 dense/MLP compute, kernel-map methods, attention variants.

Timing protocol matches bench.py: salt the input so calls can't be
deduplicated, fetch a scalar to force completion, steady-state =
(t(n_large) - t(n_small)) / (n_large - n_small).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _enable_compile_cache():
    import jax

    if jax.default_backend() == "cpu":
        return
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, args, n_small=3, n_large=13):
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(fn(*args, jnp.float32(0.0)))
    compile_s = time.perf_counter() - t0

    def run(n, base):
        t0 = time.perf_counter()
        outs = [fn(*args, jnp.float32(base + 1e-6 * i)) for i in range(n)]
        float(outs[-1])
        return time.perf_counter() - t0

    ts = run(n_small, 1.0)
    tl = run(n_large, 2.0)
    return (tl - ts) / (n_large - n_small), compile_s


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from pointcept_keypointdetection_tpu.ops.sparse import (
        SparseConvSpec,
        build_kernel_map,
        build_voxel_index,
        sparse_conv,
    )

    which = set(sys.argv[1:]) or {"dense", "kmap", "conv", "ln"}
    N = 102_400
    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 8.0, (N, 3)).astype(np.float32)
    grid_np = np.floor(coords / 0.02).astype(np.int32)
    valid_np = np.zeros((N,), bool)
    _, first = np.unique(
        grid_np[:, 0].astype(np.int64) * 10**8 + grid_np[:, 1] * 10**4 + grid_np[:, 2],
        return_index=True,
    )
    valid_np[first[: min(len(first), N - 64)]] = True
    grid = jnp.asarray(grid_np)
    valid = jnp.asarray(valid_np)
    batch = jnp.zeros((N,), jnp.int32)

    if "dense" in which:
        # MLP block: LN + Dense(c->4c) + gelu + Dense(4c->c), f32 vs bf16 compute
        for c in (32, 64):
            for dt in (jnp.float32, jnp.bfloat16):
                x = jnp.asarray(rng.normal(size=(N, c)), dt)
                w1 = jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.05, jnp.float32)
                w2 = jnp.asarray(rng.normal(size=(4 * c, c)) * 0.05, jnp.float32)

                @jax.jit
                def mlp_f32w(x, w1, w2, salt):
                    y = x + salt.astype(x.dtype)
                    h = jax.nn.gelu(y @ w1)
                    return jnp.sum((h @ w2).astype(jnp.float32))

                @jax.jit
                def mlp_castw(x, w1, w2, salt):
                    y = x + salt.astype(x.dtype)
                    h = jax.nn.gelu(y @ w1.astype(x.dtype))
                    return jnp.sum((h @ w2.astype(x.dtype)).astype(jnp.float32))

                for name, f in (("promote-w", mlp_f32w), ("cast-w", mlp_castw)):
                    per, comp = timed(f, (x, w1, w2))
                    print(f"mlp c={c} {dt.__name__:9s} {name}: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)

    if "ln" in which:
        for c in (32, 512):
            for dt in (jnp.float32, jnp.bfloat16):
                x = jnp.asarray(rng.normal(size=(N, c)), dt)

                @jax.jit
                def ln(x, salt):
                    y = (x + salt.astype(x.dtype)).astype(jnp.float32)
                    m = jnp.mean(y, axis=-1, keepdims=True)
                    v = jnp.mean(jnp.square(y - m), axis=-1, keepdims=True)
                    return jnp.sum((y - m) * jax.lax.rsqrt(v + 1e-5))

                per, comp = timed(ln, (x,))
                print(f"layernorm c={c} {dt.__name__:9s}: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)

    if "kmap" in which:
        index = build_voxel_index(grid, batch, valid)
        spec = SparseConvSpec.cube(3)
        for method in ("bsearch", "hash", "sortmerge"):
            try:
                @jax.jit
                def km(grid, batch, valid, salt):
                    g = grid + salt.astype(jnp.int32) * 0
                    m = build_kernel_map(index, g, batch, valid, spec, method=method)
                    return jnp.sum(m.neighbor_idx.astype(jnp.float32))

                per, comp = timed(km, (grid, batch, valid))
                print(f"kmap k3 {method}: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)
            except Exception as e:
                print(f"kmap k3 {method}: FAILED {type(e).__name__}: {e}", flush=True)

    if "kmap5" in which:
        # the reference's true stem is k=5 (125 offsets) — the honest-bench cost
        index = build_voxel_index(grid, batch, valid)
        spec5 = SparseConvSpec.cube(5)
        for method in ("sortmerge", "hash"):
            try:
                @jax.jit
                def km5(grid, batch, valid, salt):
                    g = grid + salt.astype(jnp.int32) * 0
                    m = build_kernel_map(index, g, batch, valid, spec5, method=method)
                    return jnp.sum(m.neighbor_idx.astype(jnp.float32))

                per, comp = timed(km5, (grid, batch, valid))
                print(f"kmap k5 {method}: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)
            except Exception as e:
                print(f"kmap k5 {method}: FAILED {type(e).__name__}: {e}", flush=True)

    if "kmap5p" in which:
        # parent-derived two-level map: coarse k=3 join + subvoxel-table
        # gathers; yields BOTH k=5 and k=3 maps
        from pointcept_keypointdetection_tpu.ops.sparse import (
            build_parent_index,
            derive_kernel_map,
        )

        spec5 = SparseConvSpec.cube(5)
        spec3 = SparseConvSpec.cube(3)

        @jax.jit
        def km5p(grid, batch, valid, salt):
            g = grid + salt.astype(jnp.int32) * 0
            parent = build_parent_index(g, batch, valid, 1)
            m5 = derive_kernel_map(parent, valid, spec5)
            m3 = derive_kernel_map(parent, valid, spec3)
            return jnp.sum(m5.neighbor_idx.astype(jnp.float32)) + jnp.sum(
                m3.neighbor_idx.astype(jnp.float32)
            )

        per, comp = timed(km5p, (grid, batch, valid))
        print(f"kmap k5+k3 parent-derived: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)

        # hypothesis (PERF r3): the fused program costs 4x its decomposition
        # because XLA duplicates the parent build into each consumer fusion;
        # an optimization_barrier forces one materialization
        @jax.jit
        def km5p_bar(grid, batch, valid, salt):
            g = grid + salt.astype(jnp.int32) * 0
            parent = build_parent_index(g, batch, valid, 1)
            barred = jax.lax.optimization_barrier(
                (parent.cell_kmap, parent.cell_table, parent.cell_of, parent.parity)
            )
            parent = parent._replace(
                cell_kmap=barred[0], cell_table=barred[1], cell_of=barred[2], parity=barred[3]
            )
            m5 = derive_kernel_map(parent, valid, spec5)
            m3 = derive_kernel_map(parent, valid, spec3)
            return jnp.sum(m5.neighbor_idx.astype(jnp.float32)) + jnp.sum(
                m3.neighbor_idx.astype(jnp.float32)
            )

        per, comp = timed(km5p_bar, (grid, batch, valid))
        print(f"kmap k5+k3 parent-derived +barrier: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)

    if "kmap5d" in which:
        # decomposition: parent build alone / derive alone / scatter+gather raw
        from pointcept_keypointdetection_tpu.ops.sparse import (
            build_parent_index,
            derive_kernel_map,
        )

        spec5 = SparseConvSpec.cube(5)
        spec3 = SparseConvSpec.cube(3)

        @jax.jit
        def pbuild(grid, batch, valid, salt):
            g = grid + salt.astype(jnp.int32) * 0
            parent = build_parent_index(g, batch, valid, 1)
            return (
                jnp.sum(parent.cell_kmap.astype(jnp.float32))
                + jnp.sum(parent.cell_of.astype(jnp.float32))
                + jnp.sum(parent.cell_table[:, 0].astype(jnp.float32))
            )

        per, comp = timed(pbuild, (grid, batch, valid))
        print(f"parent build only: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)

        parent_c = jax.jit(lambda g, b, v: build_parent_index(g, b, v, 1))(grid, batch, valid)
        parent_c = jax.tree_util.tree_map(jax.block_until_ready, parent_c)
        parent_c = parent_c._replace(shift=1)  # back to static python int post-jit

        # close over parent: .shift is a static python int, not a jit operand
        @jax.jit
        def dv5(valid, salt):
            m5 = derive_kernel_map(parent_c, valid, spec5)
            return jnp.sum(m5.neighbor_idx.astype(jnp.float32)) + salt
        @jax.jit
        def dv3(valid, salt):
            m3 = derive_kernel_map(parent_c, valid, spec3)
            return jnp.sum(m3.neighbor_idx.astype(jnp.float32)) + salt

        per, comp = timed(dv5, (valid,))
        print(f"derive k5 only: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)
        per, comp = timed(dv3, (valid,))
        print(f"derive k3 only: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)

        # raw scatter / wide-gather calibration at the shapes derive uses
        rows_i = jnp.asarray(rng.permutation(N).astype(np.int32))
        vals_i = jnp.asarray(rng.integers(0, N, N).astype(np.int32))

        @jax.jit
        def scat(rows, vals, salt):
            out = jnp.full((N + 1,), N, jnp.int32).at[rows].set(vals + salt.astype(jnp.int32) * 0, mode="drop")
            return jnp.sum(out.astype(jnp.float32))

        per, comp = timed(scat, (rows_i, vals_i))
        print(f"raw scatter [102k]: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)

        idx_wide = jnp.asarray(rng.integers(0, N, (N, 125)).astype(np.int32))
        src = jnp.asarray(rng.integers(0, N, N + 1).astype(np.int32))

        @jax.jit
        def gath_wide(src, idx, salt):
            return jnp.sum(jnp.take(src, idx, axis=0).astype(jnp.float32)) + salt

        per, comp = timed(gath_wide, (src, idx_wide))
        print(f"raw gather [102k,125] random: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)

    if "kmap5nh" in which:
        # direct k5 without symmetric halving: 2x sort rows, zero scatters
        index = build_voxel_index(grid, batch, valid)
        spec5 = SparseConvSpec.cube(5)

        @jax.jit
        def km5nh(grid, batch, valid, salt):
            g = grid + salt.astype(jnp.int32) * 0
            m = build_kernel_map(index, g, batch, valid, spec5, method="sortmerge_nohalve")
            return jnp.sum(m.neighbor_idx.astype(jnp.float32))

        per, comp = timed(km5nh, (grid, batch, valid))
        print(f"kmap k5 sortmerge_nohalve: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)

    if "kmap3sl" in which:
        # compact single-lane join (depth 10 fits bench grids)
        index_sl = build_voxel_index(grid, batch, valid, depth=10, single_lane=True)
        spec = SparseConvSpec.cube(3)

        @jax.jit
        def km3sl(grid, batch, valid, salt):
            g = grid + salt.astype(jnp.int32) * 0
            m = build_kernel_map(index_sl, g, batch, valid, spec, 10, method="sortmerge", single_lane=True)
            return jnp.sum(m.neighbor_idx.astype(jnp.float32))

        per, comp = timed(km3sl, (grid, batch, valid))
        print(f"kmap k3 sortmerge single-lane d10: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)

    if "conv5" in which:
        # the k=5 stem conv itself (in_ch 6 -> 32): is the honest-workload
        # residual the [N,125,6] im2col gather?
        from pointcept_keypointdetection_tpu.ops.sparse import (
            build_parent_index,
            derive_kernel_map,
        )

        parent_c = jax.jit(lambda g, b, v: build_parent_index(g, b, v, 1))(grid, batch, valid)
        parent_c = jax.tree_util.tree_map(jax.block_until_ready, parent_c)
        parent_c = parent_c._replace(shift=1)
        for ksz in (3, 5):
            spec = SparseConvSpec.cube(ksz)
            kmap = jax.jit(lambda v: derive_kernel_map(parent_c, v, spec))(valid)
            kmap = jax.tree_util.tree_map(jax.block_until_ready, kmap)
            k = len(spec.offsets)
            for cin, cout in ((6, 32),):
                for path, width in (("im2col", 2048), ("scan", 1)):
                    x = jnp.asarray(rng.normal(size=(N, cin)), jnp.bfloat16)
                    w = jnp.asarray(rng.normal(size=(k, cin, cout)) * 0.05, jnp.float32)

                    @jax.jit
                    def conv(x, w, salt):
                        y = x + salt.astype(x.dtype)
                        return jnp.sum(sparse_conv(y, kmap, w, im2col_max_width=width).astype(jnp.float32))

                    per, comp = timed(conv, (x, w))
                    print(f"conv k{ksz} c{cin}->{cout} {path}: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)

    if "attn1024" in which:
        # the reference ScanNet config's true patch size is 1024 — compare
        # dense-chunked XLA vs the Pallas VMEM kernel at the bench stage shapes
        from pointcept_keypointdetection_tpu.ops.attention import patch_attention_xla
        from pointcept_keypointdetection_tpu.ops.pallas.patch_attention import (
            patch_attention_pallas,
        )

        for n_s, c, h in ((102_400, 32, 2), (25_600, 64, 4), (6_400, 128, 8), (2_048, 256, 16), (1_024, 512, 32)):
            d = c // h
            qkv = jnp.asarray(rng.normal(size=(n_s, 3, h, d)), jnp.bfloat16)
            vm = jnp.asarray(np.ones((n_s,), bool))

            @jax.jit
            def att_x(qkv, vm, salt):
                q = qkv + salt.astype(qkv.dtype)
                out = patch_attention_xla(q, vm, 1024, d**-0.5, 256)
                return jnp.sum(out.astype(jnp.float32))

            @jax.jit
            def att_p(qkv, vm, salt):
                q = qkv + salt.astype(qkv.dtype)
                out = patch_attention_pallas(q, vm, 1024, d**-0.5)
                return jnp.sum(out.astype(jnp.float32))

            for name, f in (("xla", att_x), ("pallas", att_p)):
                try:
                    per, comp = timed(f, (qkv, vm))
                    print(f"attn1024 n={n_s} h={h} d={d} {name}: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)
                except Exception as e:
                    print(f"attn1024 n={n_s} h={h} d={d} {name}: FAILED {type(e).__name__}: {e}", flush=True)

    if "attn128p" in which:
        # pallas vs xla at the current bench patch size (128)
        from pointcept_keypointdetection_tpu.ops.attention import patch_attention_xla
        from pointcept_keypointdetection_tpu.ops.pallas.patch_attention import (
            patch_attention_pallas,
        )

        for n_s, c, h in ((102_400, 32, 2), (25_600, 64, 4), (6_400, 128, 8)):
            d = c // h
            qkv = jnp.asarray(rng.normal(size=(n_s, 3, h, d)), jnp.bfloat16)
            vm = jnp.asarray(np.ones((n_s,), bool))

            @jax.jit
            def att_x(qkv, vm, salt):
                q = qkv + salt.astype(qkv.dtype)
                out = patch_attention_xla(q, vm, 128, d**-0.5, 0)
                return jnp.sum(out.astype(jnp.float32))

            @jax.jit
            def att_p(qkv, vm, salt):
                q = qkv + salt.astype(qkv.dtype)
                out = patch_attention_pallas(q, vm, 128, d**-0.5)
                return jnp.sum(out.astype(jnp.float32))

            for name, f in (("xla", att_x), ("pallas", att_p)):
                try:
                    per, comp = timed(f, (qkv, vm))
                    print(f"attn128 n={n_s} h={h} d={d} {name}: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)
                except Exception as e:
                    print(f"attn128 n={n_s} h={h} d={d} {name}: FAILED {type(e).__name__}: {e}", flush=True)

    if "attn" in which:
        from pointcept_keypointdetection_tpu.ops.attention import patch_attention_xla

        # stage shapes of the bench PTv3 (102k pts, slot_divisors 1,4,16,64,128)
        for n_s, c, h in ((102_400, 32, 2), (25_600, 64, 4), (6_400, 128, 8), (1_664, 256, 16)):
            d = c // h
            for dt in (jnp.float32, jnp.bfloat16):
                qkv = jnp.asarray(rng.normal(size=(n_s, 3, h, d)), dt)
                vm = jnp.asarray(np.ones((n_s,), bool))

                @jax.jit
                def att(qkv, vm, salt):
                    q = qkv + salt.astype(qkv.dtype)
                    out = patch_attention_xla(q, vm, 128, d**-0.5, 256 if n_s >= 32768 else 0)
                    return jnp.sum(out.astype(jnp.float32))

                per, comp = timed(att, (qkv, vm))
                print(f"attn n={n_s} c={c} h={h} {dt.__name__:9s}: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)

    if "serial" in which:
        from pointcept_keypointdetection_tpu.models.structure import PointBatch

        pt = PointBatch(
            coord=jnp.asarray(coords),
            feat=jnp.asarray(rng.normal(size=(N, 6)), jnp.bfloat16),
            grid_coord=grid,
            valid=valid,
            num_samples=1,
        )

        @jax.jit
        def ser(g, salt):
            p = pt.replace(grid_coord=g + salt.astype(jnp.int32) * 0)
            p = p.serialize()
            return jnp.sum(p.serialized_order.astype(jnp.float32))

        per, comp = timed(ser, (grid,))
        print(f"serialize 4 orders @102k: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)

    if "pool" in which:
        from pointcept_keypointdetection_tpu.ops.voxelize import slotted_unique
        from pointcept_keypointdetection_tpu.ops.codes import code_or_batch as _cob
        from pointcept_keypointdetection_tpu.ops.serialization import z_order_encode as _ze
        from pointcept_keypointdetection_tpu.ops.segment import segment_reduce

        @jax.jit
        def pool(g, x, salt):
            code = _cob(_ze(g >> 1, 16), batch, 16)
            su = slotted_unique(code, valid, batch, 1, 25_600)
            y = x + salt.astype(x.dtype)
            return jnp.sum(segment_reduce(y, su.parent_row, 25_600, "max").astype(jnp.float32))

        x = jnp.asarray(rng.normal(size=(N, 64)), jnp.bfloat16)
        per, comp = timed(pool, (grid, x))
        print(f"pool(unique+segmax) 102k->25.6k c64: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)

    if "gather" in which:
        for c in (32, 64, 96):
            for dt in (jnp.float32, jnp.bfloat16):
                x = jnp.asarray(rng.normal(size=(N, c)), dt)
                idx = jnp.asarray(rng.permutation(N).astype(np.int32))

                @jax.jit
                def gat(x, idx, salt):
                    y = x + salt.astype(x.dtype)
                    return jnp.sum(jnp.take(y, idx, axis=0).astype(jnp.float32))

                per, comp = timed(gat, (x, idx))
                print(f"gather perm [102k,{c}] {dt.__name__:9s}: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)

    if "conv" in which:
        index = build_voxel_index(grid, batch, valid)
        spec = SparseConvSpec.cube(3)
        kmap = jax.jit(lambda: build_kernel_map(index, grid, batch, valid, spec))()
        for c in (32, 64):
            for path, width in (("im2col", 4096), ("scan", 1)):
                x = jnp.asarray(rng.normal(size=(N, c)), jnp.bfloat16)
                w = jnp.asarray(rng.normal(size=(27, c, c)) * 0.05, jnp.float32)

                @jax.jit
                def conv(x, w, salt):
                    y = x + salt.astype(x.dtype)
                    return jnp.sum(sparse_conv(y, kmap, w, im2col_max_width=width).astype(jnp.float32))

                per, comp = timed(conv, (x, w))
                print(f"subm conv k3 c={c} bf16 {path}: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)

    if "pconv" in which:
        # fused Pallas conv (VMEM-resident table) vs the XLA gather conv
        from pointcept_keypointdetection_tpu.ops.pallas.sparse_conv import (
            fused_subm_conv,
        )

        index = build_voxel_index(grid, batch, valid)
        spec = SparseConvSpec.cube(3)
        kmap = jax.jit(lambda: build_kernel_map(index, grid, batch, valid, spec))()
        for c in (32, 64):
            x = jnp.asarray(rng.normal(size=(N, c)), jnp.bfloat16)
            w = jnp.asarray(rng.normal(size=(27, c, c)) * 0.05, jnp.float32)

            @jax.jit
            def conv_xla(x, w, salt):
                y = x + salt.astype(x.dtype)
                return jnp.sum(sparse_conv(y, kmap, w).astype(jnp.float32))

            @jax.jit
            def conv_pallas(x, w, salt):
                y = x + salt.astype(x.dtype)
                return jnp.sum(
                    fused_subm_conv(y, kmap.neighbor_idx, w.astype(y.dtype)).astype(jnp.float32)
                )

            for name, f in (("xla", conv_xla), ("pallas", conv_pallas)):
                try:
                    per, comp = timed(f, (x, w))
                    print(f"subm conv k3 c={c} bf16 {name}: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)
                except Exception as e:
                    print(f"subm conv k3 c={c} bf16 {name}: FAILED {type(e).__name__}: {str(e).splitlines()[0][:140]}", flush=True)

    if "cellconv3" in which:
        # xCPE candidates at block channel widths: derived-map im2col conv vs
        # the cell-packed contraction (8 gathered cell rows/point instead of
        # 27 neighbor rows; 8x redundant MXU FLOPs)
        from pointcept_keypointdetection_tpu.ops.sparse import (
            build_parent_index,
            cell_packed_conv,
            derive_kernel_map,
        )

        parent_c = jax.jit(
            lambda g, b, v: build_parent_index(g, b, v, 1, 10, single_lane=True)
        )(grid, batch, valid)
        parent_c = jax.tree_util.tree_map(jax.block_until_ready, parent_c)
        parent_c = parent_c._replace(shift=1)
        spec3 = SparseConvSpec.cube(3)
        kmap3 = jax.jit(lambda v: derive_kernel_map(parent_c, v, spec3))(valid)
        kmap3 = jax.tree_util.tree_map(jax.block_until_ready, kmap3)
        for c in (32, 64):
            x = jnp.asarray(rng.normal(size=(N, c)), jnp.bfloat16)
            w = jnp.asarray(rng.normal(size=(27, c, c)) * 0.05, jnp.float32)

            @jax.jit
            def conv_map(x, w, salt):
                y = x + salt.astype(x.dtype)
                return jnp.sum(sparse_conv(y, kmap3, w).astype(jnp.float32))

            @jax.jit
            def conv_cell(x, w, salt):
                y = x + salt.astype(x.dtype)
                return jnp.sum(
                    cell_packed_conv(y, parent_c, valid, w, spec3).astype(jnp.float32)
                )

            per, comp = timed(conv_map, (x, w))
            print(f"xcpe conv k3 c={c} map-im2col: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)
            per, comp = timed(conv_cell, (x, w))
            print(f"xcpe conv k3 c={c} cell-packed: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)

    if "stemconv" in which:
        # the k=5 stem conv candidates at the honest bench shape (6 -> 32)
        from pointcept_keypointdetection_tpu.ops.sparse import (
            build_parent_index,
            cell_packed_conv,
            cell_select_conv,
            derive_kernel_map,
        )

        parent_c = jax.jit(
            lambda g, b, v: build_parent_index(g, b, v, 1, 10, single_lane=True)
        )(grid, batch, valid)
        parent_c = jax.tree_util.tree_map(jax.block_until_ready, parent_c)
        parent_c = parent_c._replace(shift=1)
        spec5 = SparseConvSpec.cube(5)
        x = jnp.asarray(rng.normal(size=(N, 6)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(125, 6, 32)) * 0.05, jnp.float32)

        @jax.jit
        def conv_packed(x, w, salt):
            y = x + salt.astype(x.dtype)
            return jnp.sum(cell_packed_conv(y, parent_c, valid, w, spec5).astype(jnp.float32))

        @jax.jit
        def conv_sel(x, w, salt):
            y = x + salt.astype(x.dtype)
            return jnp.sum(cell_select_conv(y, parent_c, valid, w, spec5).astype(jnp.float32))

        per, comp = timed(conv_packed, (x, w))
        print(f"stem conv k5 6->32 cell-packed: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)
        per, comp = timed(conv_sel, (x, w))
        print(f"stem conv k5 6->32 cell-select: {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)

    if "pbuildm" in which:
        # parent build exactly as the model calls it at stage 0: single-lane
        # depth-10 codes with the serialization argsort reused (no sort)
        from pointcept_keypointdetection_tpu.ops.sparse import build_parent_index

        iota = jnp.arange(N, dtype=jnp.int32)
        code_sl = jax.jit(
            lambda g: jax.lax.sort(
                (jnp.asarray(
                    (g[:, 0].astype(jnp.uint32) << 20)
                    | (g[:, 1].astype(jnp.uint32) << 10)
                    | g[:, 2].astype(jnp.uint32)
                ), iota),
                num_keys=1, is_stable=True,
            )[1]
        )
        # stand-in serialization perm (any batch-major z argsort works)
        from pointcept_keypointdetection_tpu.ops.serialization import z_order_encode
        zc = jax.jit(lambda g: z_order_encode(g, 10))(grid)
        perm = jax.jit(lambda lo: jax.lax.sort((lo, iota), num_keys=1, is_stable=True)[1])(zc.lo)
        perm = jax.block_until_ready(perm)

        @jax.jit
        def pb(grid, batch, valid, perm, salt):
            g = grid + salt.astype(jnp.int32) * 0
            p = build_parent_index(g, batch, valid, 1, 10, single_lane=True, precomputed_perm=perm)
            return (
                jnp.sum(p.cell_kmap.astype(jnp.float32))
                + jnp.sum(p.cell_of.astype(jnp.float32))
                + jnp.sum(p.cell_table[:, 0].astype(jnp.float32))
            )

        per, comp = timed(pb, (grid, batch, valid, perm))
        print(f"parent build model-shaped (reused perm, single-lane d10): {per*1e3:8.1f} ms (compile {comp:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
