"""Property tests of the geometry ops against numpy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

import pointcept_keypointdetection_tpu.ops as ops
from pointcept_keypointdetection_tpu.ops.codes import (
    Code64,
    code_from_u64,
    code_lexsort,
    code_shr,
    code_to_u64,
    searchsorted_code,
)
from pointcept_keypointdetection_tpu.ops.sparse import (
    SparseConvSpec,
    build_kernel_map,
    build_voxel_index,
    sparse_conv,
)
from pointcept_keypointdetection_tpu.ops.voxelize import unique_with_capacity


def test_code_shr_and_sort(rng):
    vals = rng.integers(0, 2**63, 300, dtype=np.uint64)
    code = code_from_u64(vals)
    for shift in (0, 3, 17, 32, 45):
        np.testing.assert_array_equal(code_to_u64(code_shr(code, shift)), vals >> np.uint64(shift))
    perm = np.asarray(code_lexsort(code))
    np.testing.assert_array_equal(vals[perm], np.sort(vals))


def test_searchsorted_code(rng):
    base = np.sort(rng.integers(0, 2**62, 500, dtype=np.uint64))
    queries = np.concatenate([base[rng.integers(0, 500, 200)], rng.integers(0, 2**62, 200, dtype=np.uint64)])
    got = np.asarray(searchsorted_code(code_from_u64(base), code_from_u64(queries)))
    np.testing.assert_array_equal(got, np.searchsorted(base, queries, side="left"))


def test_unique_with_capacity(rng):
    n, cap = 400, 128
    vals = rng.integers(0, 50, n, dtype=np.uint64)  # many duplicates
    valid = rng.random(n) > 0.2
    code = code_from_u64(vals)
    perm, sorted_code, res = unique_with_capacity(code, jnp.asarray(valid), cap)
    uniq = np.unique(vals[valid])
    assert int(res.num_unique) == len(uniq)
    # compacted slots hold the sorted unique codes
    sc = code_to_u64(sorted_code)
    head_codes = sc[np.asarray(res.head_index)[: len(uniq)]]
    np.testing.assert_array_equal(head_codes, uniq)
    # every valid sorted element maps to the right segment
    seg = np.asarray(res.segment_ids)
    sorted_valid = valid[np.asarray(perm)]
    np.testing.assert_array_equal(uniq[seg[sorted_valid]], sc[sorted_valid])
    # invalid elements get the capacity sentinel
    assert (seg[~sorted_valid] == cap).all()


def test_unique_overflow_drops_extras(rng):
    vals = np.arange(100, dtype=np.uint64)
    code = code_from_u64(vals)
    _, _, res = unique_with_capacity(code, jnp.ones(100, bool), 32)
    assert int(res.num_unique) == 100
    assert int(res.out_valid.sum()) == 32
    assert (np.asarray(res.segment_ids) >= 32).sum() == 68


def _np_subm_conv(coords, batch, valid, feat, weight, offsets):
    """Oracle: dict-based submanifold convolution."""
    table = {}
    for i in range(len(coords)):
        if valid[i]:
            table[(batch[i], *coords[i])] = i
    out = np.zeros((feat.shape[0], weight.shape[2]), np.float32)
    for i in range(len(coords)):
        if not valid[i]:
            continue
        for k, off in enumerate(offsets):
            key = (batch[i], *(coords[i] + np.array(off)))
            j = table.get(key)
            if j is not None:
                out[i] += feat[j] @ weight[k]
    return out


@pytest.mark.parametrize("kernel_size", [3])
@pytest.mark.parametrize("path", ["im2col", "scan"])
def test_sparse_conv_matches_oracle(rng, kernel_size, path):
    n, cin, cout = 256, 8, 16
    coords = rng.integers(0, 12, (n, 3)).astype(np.int32)
    batch = rng.integers(0, 2, n).astype(np.int32)
    valid = rng.random(n) > 0.1
    # dedup (voxel grids are unique per sample after GridSample)
    _, first = np.unique(
        batch.astype(np.int64) * 10**6 + coords[:, 0] * 10**4 + coords[:, 1] * 10**2 + coords[:, 2],
        return_index=True,
    )
    keep = np.zeros(n, bool)
    keep[first] = True
    valid &= keep

    feat = rng.normal(size=(n, cin)).astype(np.float32)
    feat[~valid] = 0
    spec = SparseConvSpec.cube(kernel_size)
    weight = rng.normal(size=(len(spec.offsets), cin, cout)).astype(np.float32) * 0.1

    index = build_voxel_index(jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid), depth=8)
    kmap = build_kernel_map(index, jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid), spec, depth=8)
    out = sparse_conv(
        jnp.asarray(feat),
        kmap,
        jnp.asarray(weight),
        im2col_max_width=4096 if path == "im2col" else 1,
    )
    expected = _np_subm_conv(coords, batch, valid, feat, weight, spec.offsets)
    np.testing.assert_allclose(np.asarray(out)[valid], expected[valid], rtol=2e-4, atol=2e-4)


def test_segment_reduce(rng):
    n, m, c = 200, 32, 4
    seg = rng.integers(0, m + 1, n)  # m = dropped sentinel
    data = rng.normal(size=(n, c)).astype(np.float32)
    for reduce in ("sum", "mean", "max", "min"):
        out = np.asarray(ops.segment_reduce(jnp.asarray(data), jnp.asarray(seg), m, reduce))
        for s in range(m):
            rows = data[seg == s]
            if len(rows) == 0:
                np.testing.assert_allclose(out[s], 0)
            else:
                expected = dict(
                    sum=rows.sum(0), mean=rows.mean(0), max=rows.max(0), min=rows.min(0)
                )[reduce]
                np.testing.assert_allclose(out[s], expected, rtol=1e-5, atol=1e-5)


def test_knn_matches_numpy(rng):
    q, n, k = 64, 300, 5
    query = rng.normal(size=(q, 3)).astype(np.float32)
    base = rng.normal(size=(n, 3)).astype(np.float32)
    qb = rng.integers(0, 2, q).astype(np.int32)
    bb = rng.integers(0, 2, n).astype(np.int32)
    bvalid = rng.random(n) > 0.1

    idx, sqd = ops.knn(
        jnp.asarray(query), jnp.asarray(base), k,
        query_batch=jnp.asarray(qb), base_batch=jnp.asarray(bb), base_valid=jnp.asarray(bvalid),
        chunk=64,
    )
    idx, sqd = np.asarray(idx), np.asarray(sqd)
    d_all = ((query[:, None, :] - base[None, :, :]) ** 2).sum(-1)
    d_all[:, ~bvalid] = np.inf
    d_all[qb[:, None] != bb[None, :]] = np.inf
    expected = np.sort(d_all, axis=1)[:, :k]
    np.testing.assert_allclose(np.sort(sqd, axis=1), expected, rtol=1e-4, atol=1e-4)
    # indices actually achieve those distances
    np.testing.assert_allclose(
        np.take_along_axis(d_all, idx, axis=1), sqd, rtol=1e-4, atol=1e-4
    )


def test_three_nn_interpolate_exact_at_source(rng):
    n, c = 50, 6
    base = rng.normal(size=(n, 3)).astype(np.float32)
    feat = rng.normal(size=(n, c)).astype(np.float32)
    out = ops.three_nn_interpolate(jnp.asarray(base), jnp.asarray(base), jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(out), feat, rtol=1e-3, atol=1e-3)


def test_fps_spreads_points(rng):
    n = 256
    coord = rng.normal(size=(n, 3)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[200:] = False
    idx = np.asarray(ops.farthest_point_sampling(jnp.asarray(coord), 32, jnp.asarray(valid)))
    assert (idx < 200).all()
    assert len(np.unique(idx)) == 32
    # FPS min pairwise distance should beat random sampling's
    sel = coord[idx]
    d = ((sel[:, None] - sel[None, :]) ** 2).sum(-1) + np.eye(32) * 1e9
    rand = coord[rng.choice(200, 32, replace=False)]
    dr = ((rand[:, None] - rand[None, :]) ** 2).sum(-1) + np.eye(32) * 1e9
    assert d.min() > dr.min() * 0.9


def test_kernel_map_methods_agree(rng):
    n = 300
    coords = rng.integers(0, 14, (n, 3)).astype(np.int32)
    batch = rng.integers(0, 2, n).astype(np.int32)
    valid = rng.random(n) > 0.15
    # voxels are unique per sample post-GridSample (both methods assume it:
    # with duplicates they legitimately pick different equal-key targets)
    _, first = np.unique(
        batch.astype(np.int64) * 10**6 + coords[:, 0] * 10**4 + coords[:, 1] * 10**2 + coords[:, 2],
        return_index=True,
    )
    keep = np.zeros(n, bool)
    keep[first] = True
    valid &= keep
    index = build_voxel_index(jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid), depth=8)
    spec = SparseConvSpec.cube(3)
    a = build_kernel_map(index, jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid), spec, 8, method="sortmerge")
    b = build_kernel_map(index, jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid), spec, 8, method="bsearch")
    np.testing.assert_array_equal(np.asarray(a.neighbor_idx), np.asarray(b.neighbor_idx))
    h = build_kernel_map(index, jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid), spec, 8, method="hash")
    np.testing.assert_array_equal(np.asarray(h.neighbor_idx), np.asarray(b.neighbor_idx))


def test_kernel_map_hash_parity_large(rng):
    """Hash-table kernel map vs the bsearch oracle on a realistic voxel cloud
    (multi-batch, k=3 and k=5, invalid padding)."""
    n = 8192
    coords = rng.integers(0, 40, (n, 3)).astype(np.int32)
    batch = np.sort(rng.integers(0, 4, n)).astype(np.int32)
    valid = rng.random(n) > 0.15
    _, first = np.unique(
        batch.astype(np.int64) * 10**9 + coords[:, 0] * 10**6 + coords[:, 1] * 10**3 + coords[:, 2],
        return_index=True,
    )
    keep = np.zeros(n, bool)
    keep[first] = True
    valid &= keep
    g, b, v = jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid)
    index = build_voxel_index(g, b, v)
    for ksz in (3, 5):
        spec = SparseConvSpec.cube(ksz)
        oracle = build_kernel_map(index, g, b, v, spec, method="bsearch")
        h = build_kernel_map(index, g, b, v, spec, method="hash")
        np.testing.assert_array_equal(np.asarray(h.neighbor_idx), np.asarray(oracle.neighbor_idx))


def test_parent_derived_kernel_map_matches_direct(rng):
    """The two-level (coarse cell + subvoxel table) kernel map must equal the
    direct sort-merge build for every kernel size within its radius."""
    from pointcept_keypointdetection_tpu.ops.sparse import (
        build_parent_index,
        derive_kernel_map,
    )

    n = 4096
    coords = rng.integers(0, 31, (n, 3)).astype(np.int32)  # odd range: parity coverage
    batch = np.sort(rng.integers(0, 3, n)).astype(np.int32)
    valid = rng.random(n) > 0.2
    _, first = np.unique(
        batch.astype(np.int64) * 10**9 + coords[:, 0] * 10**6 + coords[:, 1] * 10**3 + coords[:, 2],
        return_index=True,
    )
    keep = np.zeros(n, bool)
    keep[first] = True
    valid &= keep
    g, b, v = jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid)
    index = build_voxel_index(g, b, v)
    parent = build_parent_index(g, b, v, shift=1)
    for ksz in (3, 5):
        spec = SparseConvSpec.cube(ksz)
        oracle = build_kernel_map(index, g, b, v, spec, method="bsearch")
        derived = derive_kernel_map(parent, v, spec)
        np.testing.assert_array_equal(
            np.asarray(derived.neighbor_idx), np.asarray(oracle.neighbor_idx)
        )
    # shift=2 covers k=7 (PTv3Plus large-kernel xCPE territory)
    parent2 = build_parent_index(g, b, v, shift=2)
    for ksz in (3, 5, 7):
        spec = SparseConvSpec.cube(ksz)
        oracle = build_kernel_map(index, g, b, v, spec, method="bsearch")
        derived = derive_kernel_map(parent2, v, spec)
        np.testing.assert_array_equal(
            np.asarray(derived.neighbor_idx), np.asarray(oracle.neighbor_idx)
        )


def test_cell_packed_conv_matches_derived_map_conv(rng):
    """cell_packed_conv (27-cell gather + parity-expanded MXU contraction)
    must equal sparse_conv over the derived per-point kernel map exactly —
    same active-site semantics, missing neighbors zero, invalid rows zero."""
    from pointcept_keypointdetection_tpu.ops.sparse import (
        build_parent_index,
        cell_packed_conv,
        derive_kernel_map,
        sparse_conv,
    )

    n = 2048
    coords = rng.integers(0, 23, (n, 3)).astype(np.int32)
    batch = np.sort(rng.integers(0, 2, n)).astype(np.int32)
    valid = rng.random(n) > 0.15
    _, first = np.unique(
        batch.astype(np.int64) * 10**9 + coords[:, 0] * 10**6 + coords[:, 1] * 10**3 + coords[:, 2],
        return_index=True,
    )
    keep = np.zeros(n, bool)
    keep[first] = True
    valid &= keep
    g, b, v = jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid)
    parent = build_parent_index(g, b, v, shift=1)
    feat = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    for ksz in (3, 5):
        spec = SparseConvSpec.cube(ksz)
        w = jnp.asarray(rng.normal(size=(len(spec.offsets), 6, 8)).astype(np.float32) * 0.1)
        bias = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
        kmap = derive_kernel_map(parent, v, spec)
        ref = sparse_conv(jnp.where(v[:, None], feat, 0), kmap, w, bias)
        out = cell_packed_conv(feat, parent, v, w, spec, bias)
        np.testing.assert_allclose(
            np.asarray(out)[np.asarray(v)], np.asarray(ref)[np.asarray(v)], rtol=2e-4, atol=2e-4
        )
        from pointcept_keypointdetection_tpu.ops.sparse import cell_select_conv

        out_sel = cell_select_conv(feat, parent, v, w, spec, bias)
        np.testing.assert_allclose(
            np.asarray(out_sel)[np.asarray(v)], np.asarray(ref)[np.asarray(v)], rtol=2e-4, atol=2e-4
        )


def test_kernel_map_single_lane_matches(rng):
    """Compact (one-u32-key) joins must equal the two-lane build when the
    code bits fit: depth 9 grids, multi-batch, k=3 and k=5, parent-derived."""
    from pointcept_keypointdetection_tpu.ops.sparse import (
        build_parent_index,
        derive_kernel_map,
        kmap_single_lane,
    )

    n = 4096
    coords = rng.integers(0, 500, (n, 3)).astype(np.int32)  # < 2^9
    batch = np.sort(rng.integers(0, 3, n)).astype(np.int32)
    valid = rng.random(n) > 0.2
    _, first = np.unique(
        batch.astype(np.int64) * 10**9 + coords[:, 0] * 10**6 + coords[:, 1] * 10**3 + coords[:, 2],
        return_index=True,
    )
    keep = np.zeros(n, bool)
    keep[first] = True
    valid &= keep
    g, b, v = jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid)
    assert kmap_single_lane(9, 3) and not kmap_single_lane(16, 3)
    for ksz in (3, 5):
        spec = SparseConvSpec.cube(ksz)
        ref_idx = build_voxel_index(g, b, v, depth=16)
        oracle = build_kernel_map(ref_idx, g, b, v, spec, 16, method="bsearch")
        idx_sl = build_voxel_index(g, b, v, depth=9, single_lane=True)
        compact = build_kernel_map(idx_sl, g, b, v, spec, 9, method="sortmerge", single_lane=True)
        np.testing.assert_array_equal(
            np.asarray(compact.neighbor_idx), np.asarray(oracle.neighbor_idx)
        )
        parent = build_parent_index(g, b, v, shift=1, depth=9, single_lane=True)
        derived = derive_kernel_map(parent, v, spec)
        np.testing.assert_array_equal(
            np.asarray(derived.neighbor_idx), np.asarray(oracle.neighbor_idx)
        )


def test_sparse_conv_symmetric_vjp_matches_autodiff(rng):
    """The scatter-free mirrored-map backward must match XLA autodiff of the
    plain gather conv exactly (same map, centered-cube ordering)."""
    import jax
    import jax.numpy as jnp

    from pointcept_keypointdetection_tpu.ops.sparse import (
        SparseConvSpec,
        build_kernel_map,
        build_voxel_index,
        sparse_conv,
    )

    n = 257
    coords = rng.integers(0, 8, (n, 3)).astype(np.int32)
    # dedupe so the map is a function
    _, first = np.unique(
        coords[:, 0] * 100 + coords[:, 1] * 10 + coords[:, 2], return_index=True
    )
    valid = np.zeros(n, bool)
    valid[first] = True
    grid = jnp.asarray(coords)
    v = jnp.asarray(valid)
    batch = jnp.zeros(n, jnp.int32)
    index = build_voxel_index(grid, batch, v)
    kmap = build_kernel_map(index, grid, batch, v, SparseConvSpec.cube(3))

    feat = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, 8, 6)).astype(np.float32) * 0.1)
    g_out = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))

    def loss_sym(f, ww):
        return jnp.sum(sparse_conv(f, kmap, ww, symmetric=True) * g_out)

    def loss_ref(f, ww):
        return jnp.sum(sparse_conv(f, kmap, ww, symmetric=False) * g_out)

    gf_sym, gw_sym = jax.grad(loss_sym, argnums=(0, 1))(feat, w)
    gf_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(feat, w)
    np.testing.assert_allclose(np.asarray(gf_sym), np.asarray(gf_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_sym), np.asarray(gw_ref), rtol=1e-4, atol=1e-4)
    # forward values identical too
    np.testing.assert_allclose(
        np.asarray(sparse_conv(feat, kmap, w, symmetric=True)),
        np.asarray(sparse_conv(feat, kmap, w, symmetric=False)),
        rtol=1e-5, atol=1e-5,
    )


def test_take_permutation_vjp(rng):
    import jax
    import jax.numpy as jnp

    from pointcept_keypointdetection_tpu.ops.attention import take_permutation

    n = 97
    perm = rng.permutation(n)
    inv = np.empty(n, np.int32)
    inv[perm] = np.arange(n)
    x = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    g_out = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    p, i = jnp.asarray(perm.astype(np.int32)), jnp.asarray(inv)

    np.testing.assert_array_equal(
        np.asarray(take_permutation(x, p, i)), np.asarray(x)[perm]
    )
    g_custom = jax.grad(lambda x_: jnp.sum(take_permutation(x_, p, i) * g_out))(x)
    g_ref = jax.grad(lambda x_: jnp.sum(jnp.take(x_, p, axis=0) * g_out))(x)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref), rtol=1e-6)


def test_knn_bucketed_matches_brute_force(rng):
    # dense-enough uniform cloud: k-th neighbor well within one cell
    n, q, k = 4000, 512, 8
    base = rng.uniform(0, 2.0, (n, 3)).astype(np.float32)
    query = rng.uniform(0.2, 1.8, (q, 3)).astype(np.float32)
    cell = 0.35  # ~85 pts/cell avg at this density -> k-th nn << cell
    idx_b, d_b = ops.knn_bucketed(
        jnp.asarray(query), jnp.asarray(base), k, cell, cell_cap=256, query_chunk=128
    )
    idx_o, d_o = ops.knn(jnp.asarray(query), jnp.asarray(base), k)
    np.testing.assert_allclose(
        np.sort(np.asarray(d_b), axis=1), np.sort(np.asarray(d_o), axis=1), rtol=1e-4, atol=1e-5
    )
    # single-lane compact codes (span 2/0.35 ~ 6 cells << 2^8): same result
    idx_s, d_s = ops.knn_bucketed(
        jnp.asarray(query), jnp.asarray(base), k, cell, cell_cap=256, query_chunk=128,
        depth=8, single_lane=True,
    )
    np.testing.assert_allclose(
        np.sort(np.asarray(d_s), axis=1), np.sort(np.asarray(d_o), axis=1), rtol=1e-4, atol=1e-5
    )


def test_knn_bucketed_batched_and_masked(rng):
    n, q, k = 2000, 256, 4
    base = rng.uniform(0, 1.5, (n, 3)).astype(np.float32)
    query = rng.uniform(0.2, 1.3, (q, 3)).astype(np.float32)
    bb = rng.integers(0, 2, n).astype(np.int32)
    qb = rng.integers(0, 2, q).astype(np.int32)
    bvalid = rng.random(n) > 0.1
    cell = 0.4
    idx_b, d_b = ops.knn_bucketed(
        jnp.asarray(query), jnp.asarray(base), k, cell,
        query_batch=jnp.asarray(qb), base_batch=jnp.asarray(bb),
        base_valid=jnp.asarray(bvalid), cell_cap=256, query_chunk=256,
    )
    idx_o, d_o = ops.knn(
        jnp.asarray(query), jnp.asarray(base), k,
        query_batch=jnp.asarray(qb), base_batch=jnp.asarray(bb),
        base_valid=jnp.asarray(bvalid),
    )
    np.testing.assert_allclose(
        np.sort(np.asarray(d_b), axis=1), np.sort(np.asarray(d_o), axis=1), rtol=1e-4, atol=1e-5
    )
    # returned indices are consistent with the distances and the masks
    idx_b = np.asarray(idx_b)
    d_all = ((query[:, None] - base[None]) ** 2).sum(-1)
    np.testing.assert_allclose(
        np.take_along_axis(d_all, idx_b, 1), np.asarray(d_b), rtol=1e-4, atol=1e-5
    )
    assert bvalid[idx_b].all()
    assert (bb[idx_b] == qb[:, None]).all()


def test_knn_bucketed_reports_misses(rng):
    # two far-apart clusters with a tiny cell: cross-cluster neighbors are
    # out of ring range -> missing slots flagged with huge sqdist
    base = np.array([[0.0, 0, 0], [10.0, 0, 0]], np.float32)
    query = np.array([[0.0, 0, 0]], np.float32)
    idx, d = ops.knn_bucketed(jnp.asarray(query), jnp.asarray(base), 2, 0.5, cell_cap=4)
    d = np.asarray(d)
    assert d[0, 0] < 1e-6
    assert d[0, 1] >= 1e9  # the 10-away point is not reachable in one ring


def test_ball_query_bucketed_matches_brute(rng):
    """Bucketed ball query must agree with the brute path on the within-radius
    mask and the within-radius indices (fill indices may differ by contract)."""
    n, q, k = 3000, 400, 12
    base = rng.uniform(0, 2.0, (n, 3)).astype(np.float32)
    query = rng.uniform(0.1, 1.9, (q, 3)).astype(np.float32)
    r = 0.25
    idx_a, m_a = ops.ball_query(jnp.asarray(query), jnp.asarray(base), r, k)
    idx_b, m_b = ops.ball_query(
        jnp.asarray(query), jnp.asarray(base), r, k, bucketed=True, cell_cap=256
    )
    m_a, m_b = np.asarray(m_a), np.asarray(m_b)
    idx_a, idx_b = np.asarray(idx_a), np.asarray(idx_b)
    np.testing.assert_array_equal(m_a.sum(1), m_b.sum(1))
    for i in range(q):  # same within-radius candidate sets (order-free)
        np.testing.assert_array_equal(
            np.sort(idx_a[i][m_a[i]]), np.sort(idx_b[i][m_b[i]])
        )


def test_three_nn_interpolate_bucketed_matches_brute(rng):
    n, q, c = 2500, 600, 8
    base = rng.uniform(0, 2.0, (n, 3)).astype(np.float32)
    query = rng.uniform(0.2, 1.8, (q, 3)).astype(np.float32)
    feat = rng.normal(size=(n, c)).astype(np.float32)
    out_a = ops.three_nn_interpolate(jnp.asarray(query), jnp.asarray(base), jnp.asarray(feat))
    out_b = ops.three_nn_interpolate(
        jnp.asarray(query), jnp.asarray(base), jnp.asarray(feat), cell_size=0.3, cell_cap=256
    )
    # tolerance: the two paths compute distances differently (MXU q^2-2qb+b^2
    # vs direct (p-q)^2) so near-tied 3rd neighbors may swap
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-3, atol=1e-3)


def test_knn_unit_cell_lattice_matches_brute(rng):
    """Unit-cell search (cell == the base's dedup voxel, cap=1, sphere-pruned
    ring, no code checks — the SLAM map configuration): exact vs brute for
    every neighbor within the ring's L-inf reach."""
    from pointcept_keypointdetection_tpu.ops.knn import build_knn_index, knn_query_index

    voxel = 0.35
    origin = np.array([-5.0, -5.0, -2.0], np.float32)
    n_raw = 6000
    pts = rng.uniform(0, 12.0, (n_raw, 3)).astype(np.float32)
    # voxel-dedup on the lattice floor((p - origin)/voxel): one point per cell
    grid = np.floor((pts - origin) / voxel).astype(np.int64)
    key = grid[:, 0] * 10**8 + grid[:, 1] * 10**4 + grid[:, 2]
    _, first = np.unique(key, return_index=True)
    base = pts[first]
    n = len(base)
    query = rng.uniform(1.0, 11.0, (128, 3)).astype(np.float32)
    k, corr = 5, 1.0
    ring = int(np.ceil(corr / voxel))

    index = build_knn_index(
        jnp.asarray(base), voxel, cell_cap=1, depth=9, single_lane=True,
        lattice_origin=jnp.asarray(origin),
    )
    idx, sqd = knn_query_index(
        index, jnp.asarray(query), k, voxel, cell_cap=1, depth=9,
        ring_radius=ring, verify_codes=False, lattice_origin=jnp.asarray(origin),
    )
    idx_o, d_o = ops.knn(jnp.asarray(query), jnp.asarray(base), k)
    # compare where the oracle's k-th neighbor is inside the ring's reach
    d_b = np.sort(np.asarray(sqd), axis=1)
    d_ref = np.sort(np.asarray(d_o), axis=1)
    covered = d_ref[:, -1] <= corr**2
    assert covered.sum() > 50  # the scene is dense enough to test something
    # brute knn expands |q-b|^2 = q^2 - 2qb + b^2 on the MXU (catastrophic
    # cancellation); the lattice path subtracts directly -> small f32 skew
    np.testing.assert_allclose(d_b[covered], d_ref[covered], rtol=5e-3, atol=1e-4)
