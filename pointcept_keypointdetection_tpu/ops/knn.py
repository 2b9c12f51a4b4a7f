"""k-nearest-neighbor / ball query / 3-NN interpolation.

The TPU replacement for the reference's CUDA ``pointops`` queries
(`libs/pointops/src/knn_query/`, `ball_query/`, `interpolation/`) used by
PTv1/PTv2 grouping, the evaluators' map-to-origin step (`engines/test.py:32-35`)
and unpooling interpolation.

Two implementations:

* ``knn`` — tiled brute force.  Distances are computed chunk-by-chunk with
  ``lax.scan`` holding a running top-k, so memory stays at ``Q x chunk``
  instead of ``Q x N``; the inner products ride the MXU.  Cross-batch matches
  are excluded by adding a large penalty when batch ids differ.  O(Q*N) —
  the exact oracle, fine at evaluator sizes.
* ``knn_bucketed`` — grid-bucketed candidate search (the TPU analogue of the
  reference's per-query CUDA neighborhood walks): base points are sorted by
  the Morton code of their grid cell; each query inspects the 27 neighboring
  cells' runs (up to ``cell_cap`` points each) found by one sort-merge join
  against the sorted cell codes, then takes top-k over ~27*cell_cap exact
  distances.  O(Q * 27 * cap) — the scalable path for PTv1/PTv2 grouping at
  100k+ points.  EXACT whenever the k-th true neighbor is within L-inf
  distance ``cell_size`` of the query and no searched cell overflows
  ``cell_cap`` (property-tested against ``knn``); misses are reported via
  ``sqdist >= _BIG`` so callers can widen ``cell_size``/``cell_cap``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e10


def knn(
    query: jnp.ndarray,  # [Q, 3]
    base: jnp.ndarray,  # [N, 3]
    k: int,
    query_batch: Optional[jnp.ndarray] = None,
    base_batch: Optional[jnp.ndarray] = None,
    base_valid: Optional[jnp.ndarray] = None,
    chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (idx int32[Q, k], sqdist f32[Q, k]) of the k nearest base points."""
    q = query.shape[0]
    n = base.shape[0]
    chunk = min(chunk, n)
    num_chunks = -(-n // chunk)
    pad_n = num_chunks * chunk

    base_p = jnp.pad(base, ((0, pad_n - n), (0, 0)))
    invalid = jnp.zeros((pad_n,), bool).at[jnp.arange(pad_n)].set(jnp.arange(pad_n) >= n)
    if base_valid is not None:
        invalid = invalid | ~jnp.pad(base_valid, (0, pad_n - n))
    bb = jnp.pad(base_batch, (0, pad_n - n)) if base_batch is not None else None

    q_sq = jnp.sum(query * query, axis=-1, keepdims=True)  # [Q,1]

    def body(carry, inputs):
        best_d, best_i = carry
        if bb is not None:
            b_chunk, bb_chunk, inv_chunk, start = inputs
        else:
            b_chunk, inv_chunk, start = inputs
            bb_chunk = None
        # squared distances [Q, chunk] via MXU inner products
        d = q_sq - 2.0 * jnp.dot(query, b_chunk.T, preferred_element_type=jnp.float32) + jnp.sum(
            b_chunk * b_chunk, axis=-1
        )[None, :]
        d = jnp.where(inv_chunk[None, :], _BIG, d)
        if bb_chunk is not None:
            d = jnp.where(query_batch[:, None] != bb_chunk[None, :], _BIG, d)
        idx = start + jax.lax.broadcasted_iota(jnp.int32, (q, b_chunk.shape[0]), 1)
        # merge with running top-k
        all_d = jnp.concatenate([best_d, d], axis=1)
        all_i = jnp.concatenate([best_i, idx], axis=1)
        neg_top, top_i = jax.lax.top_k(-all_d, k)
        return (-neg_top, jnp.take_along_axis(all_i, top_i, axis=1)), None

    init = (jnp.full((q, k), _BIG, jnp.float32), jnp.zeros((q, k), jnp.int32))
    starts = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
    chunks = base_p.reshape(num_chunks, chunk, 3)
    inv_chunks = invalid.reshape(num_chunks, chunk)
    if bb is not None:
        xs = (chunks, bb.reshape(num_chunks, chunk), inv_chunks, starts)
    else:
        xs = (chunks, inv_chunks, starts)
    (best_d, best_i), _ = jax.lax.scan(body, init, xs)
    return best_i, best_d


def _run_head_lookup(sorted_code, qhi, qlo, n):
    """Sort-merge join: for each query code, the SORTED-ARRAY POSITION of the
    first base entry with an equal code (or ``n`` when absent).

    Same design as ops/sparse._sortmerge_lookup (stable lexsort + running
    last-target scan; base entries precede queries so equal keys resolve to
    the base run), except the target payload is each entry's RUN-HEAD position
    rather than its voxel row — every member of an equal-code run carries the
    run's first sorted position, so the scan hands queries the run start.

    ``qhi=None`` selects the single-lane path (codes proven to fit one u32):
    one sort key and a 2-operand scan instead of two keys and four operands."""
    nq = qlo.shape[0]
    # run heads within the sorted base codes
    iota = jnp.arange(n, dtype=jnp.int32)
    prev_lo = jnp.concatenate([jnp.full((1,), 0xFFFFFFFF, jnp.uint32), sorted_code.lo[:-1]])
    if qhi is None:
        is_head = sorted_code.lo != prev_lo
        head_pos = jax.lax.associative_scan(jnp.maximum, jnp.where(is_head, iota, -1))
        lo = jnp.concatenate([sorted_code.lo, qlo])
        payload = jnp.concatenate([head_pos, n + jnp.arange(nq, dtype=jnp.int32)])
        s_lo, s_payload = jax.lax.sort((lo, payload), num_keys=1, is_stable=True)
        is_target = s_payload < n
        live = is_target & (s_lo != jnp.uint32(0xFFFFFFFF))

        def combine1(a, b):
            ra, la = a
            rb, lb = b
            keep_b = rb >= 0
            return (jnp.where(keep_b, rb, ra), jnp.where(keep_b, lb, la))

        run_pos, run_lo = jax.lax.associative_scan(
            combine1, (jnp.where(live, s_payload, -1), s_lo)
        )
        hit = (run_lo == s_lo) & (~is_target) & (run_pos >= 0)
        result_sorted = jnp.where(hit, run_pos, n).astype(jnp.int32)
        qid = jnp.where(is_target, nq, s_payload - n)
        _, out = jax.lax.sort((qid, result_sorted), num_keys=1, is_stable=True)
        return jax.lax.slice_in_dim(out, 0, nq)

    prev_hi = jnp.concatenate([jnp.full((1,), 0xFFFFFFFF, jnp.uint32), sorted_code.hi[:-1]])
    is_head = (sorted_code.hi != prev_hi) | (sorted_code.lo != prev_lo)
    # head position per sorted element: running max of head indices
    head_pos = jax.lax.associative_scan(jnp.maximum, jnp.where(is_head, iota, -1))

    hi = jnp.concatenate([sorted_code.hi, qhi])
    lo = jnp.concatenate([sorted_code.lo, qlo])
    payload = jnp.concatenate([head_pos, n + jnp.arange(nq, dtype=jnp.int32)])

    order = jnp.lexsort((lo, hi))
    s_hi = jnp.take(hi, order)
    s_lo = jnp.take(lo, order)
    s_payload = jnp.take(payload, order)

    is_target = s_payload < n
    live = is_target & ~((s_hi == jnp.uint32(0xFFFFFFFF)) & (s_lo == jnp.uint32(0xFFFFFFFF)))

    def combine(a, b):
        fa, ra, ha, la = a
        fb, rb, hb, lb = b
        return (fa | fb, jnp.where(fb, rb, ra), jnp.where(fb, hb, ha), jnp.where(fb, lb, la))

    _, run_pos, run_hi, run_lo = jax.lax.associative_scan(
        combine, (live, jnp.where(live, s_payload, -1), s_hi, s_lo)
    )
    hit = (run_hi == s_hi) & (run_lo == s_lo) & (~is_target) & (run_pos >= 0)
    result_sorted = jnp.where(hit, run_pos, n).astype(jnp.int32)
    # unscatter-by-sort (2.5x cheaper than the [n+nq] scatter, see
    # ops/sparse._unscatter_by_sort)
    qid = jnp.where(is_target, nq, s_payload - n)
    _, out = jax.lax.sort((qid, result_sorted), num_keys=1, is_stable=True)
    return jax.lax.slice_in_dim(out, 0, nq)


def small_top_k(neg_d: jnp.ndarray, k: int):
    """Exact top-k by k argmax-extraction passes — for small k over wide
    candidate rows, k linear reductions are far cheaper than lax.top_k's
    sort-based lowering (the SLAM correspondence search does k=5 over 1728
    candidates x 16k queries per ICP iteration)."""
    vals = []
    idxs = []
    d = neg_d
    for _ in range(k):
        i = jnp.argmax(d, axis=-1)
        v = jnp.take_along_axis(d, i[..., None], axis=-1)[..., 0]
        vals.append(v)
        idxs.append(i.astype(jnp.int32))
        d = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, d.shape, d.ndim - 1) == i[..., None],
            -jnp.inf,
            d,
        )
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


class KnnIndex(NamedTuple):
    """Sorted-cell index over the base points (build once, query many — the
    SLAM ICP loop queries the SAME map 7x per scan; hoisting the build out of
    the iteration loop removes 6 redundant [N]-scale sorts per scan).

    ``packed``: [N+cap, 8] f32 rows (x, y, z, sorted-row's base index,
    code-lo bitcast, code-hi bitcast, 0, 0) in SORTED order — the candidate
    inspection is then ONE wide-row gather instead of three narrow ones
    (measured 3.1x cheaper at the SLAM shape: narrow-row gathers cost
    ~45 ns/row on the bench backend, wide rows ~10 ns).  Invalid rows carry
    position 1e9 so they can never win a distance top-k."""

    pad_hi: Optional[jnp.ndarray]  # [N+cap] sorted code hi lane; None = single-lane
    pad_lo: jnp.ndarray  # [N+cap] sorted code lo lane (sentinel-padded)
    packed: jnp.ndarray  # [N+cap, 8] f32 (see above)
    origin: jnp.ndarray  # [3] int32 cell origin (cells are rebased to it)


def build_knn_index(
    base: jnp.ndarray,
    cell_size: float,
    base_batch: Optional[jnp.ndarray] = None,
    base_valid: Optional[jnp.ndarray] = None,
    cell_cap: int = 32,
    depth: int = 16,
    single_lane: bool = False,
    lattice_origin=None,
) -> KnnIndex:
    """``single_lane=True`` (caller-contracted: 3*depth + batch bits <= 31
    and the base's cell span + 4 fits 2^depth) sorts one u32 key instead of
    an (hi, lo) pair — the right setting for the SLAM map, whose sliding
    window spans a few hundred cells.

    ``lattice_origin``: world coords of cell (0,0,0) — pass the voxel map's
    origin so knn cells COINCIDE with the map's dedup voxels: at
    ``cell_size == map_voxel`` every cell then holds at most ONE point and
    ``cell_cap=1`` queries are exact with no per-candidate code check."""
    from .codes import code_fill_invalid, code_lexsort, code_or_batch, code_take
    from .serialization import z_order_encode

    n = base.shape[0]
    if base_valid is None:
        base_valid = jnp.ones((n,), bool)
    bb = base_batch if base_batch is not None else jnp.zeros((n,), jnp.int32)

    inv = 1.0 / cell_size
    shifted = base if lattice_origin is None else base - jnp.asarray(lattice_origin, base.dtype)
    bcell = jnp.floor(shifted * inv).astype(jnp.int32)
    # shift to non-negative (z-order domain); -1 margin for the ring offsets
    origin = jnp.min(jnp.where(base_valid[:, None], bcell, 2**20), axis=0) - 1
    bcell = bcell - origin
    b_in = base_valid & jnp.all((bcell >= 0) & (bcell < (1 << depth)), axis=-1)

    bcode = code_or_batch(z_order_encode(jnp.clip(bcell, 0, (1 << depth) - 1), depth), bb, depth)
    bcode = code_fill_invalid(bcode, b_in)
    if single_lane:
        iota = jnp.arange(n, dtype=jnp.int32)
        _, perm = jax.lax.sort((bcode.lo, iota), num_keys=1, is_stable=True)
    else:
        perm = code_lexsort(bcode)
    scode = code_take(bcode, perm)

    pad_hi = (
        None
        if single_lane
        else jnp.concatenate([scode.hi, jnp.full((cell_cap,), 0xFFFFFFFF, jnp.uint32)])
    )
    pad_lo = jnp.concatenate([scode.lo, jnp.full((cell_cap,), 0xFFFFFFFF, jnp.uint32)])
    sorted_valid = jnp.take(b_in, perm, axis=0)
    sorted_pos = jnp.where(
        sorted_valid[:, None], jnp.take(base, perm, axis=0).astype(jnp.float32), _BIG
    )
    packed = jnp.concatenate(
        [
            jnp.concatenate([sorted_pos, jnp.full((cell_cap, 3), _BIG, jnp.float32)], axis=0),
            jnp.concatenate([perm.astype(jnp.float32), jnp.zeros((cell_cap,), jnp.float32)])[:, None],
            jax.lax.bitcast_convert_type(pad_lo, jnp.float32)[:, None],
            jax.lax.bitcast_convert_type(
                pad_hi
                if pad_hi is not None
                else jnp.zeros((n + cell_cap,), jnp.uint32),
                jnp.float32,
            )[:, None],
            jnp.zeros((n + cell_cap, 2), jnp.float32),
        ],
        axis=1,
    )
    return KnnIndex(pad_hi=pad_hi, pad_lo=pad_lo, packed=packed, origin=origin)


def _ring_offsets(radius: int, corr_cells: Optional[float] = None) -> np.ndarray:
    """Sphere-pruned cell ring: |d|_inf <= r AND |d|_2 <= r + sqrt(3) (a cell
    within L2 reach of the query's cell; prunes ~45% of the cube's corners
    at r=3 with zero recall loss for L2-ball neighbor queries).

    ``corr_cells`` (= max_corr_dist / cell_size) switches to the EXACT
    min-cell-distance prune for distance-GATED searches: a candidate cell at
    offset d can hold a point within max_corr of a query in cell 0 only if
    ||max(|d|-1, 0)||_2 <= corr_cells (per-axis minimum separation is
    (|d_i|-1) cells).  18% fewer candidates than the generic rule at the
    SLAM shape (r=3, corr_cells=2.5: 335 -> 275) — exact for callers whose
    own distance gate discards beyond-max_corr neighbors (ICP), NOT for
    pure nearest-neighbor semantics (a true nearest farther than max_corr
    would be missed)."""
    r = radius
    g = np.arange(-r, r + 1)
    d = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    if corr_cells is not None:
        m = np.maximum(np.abs(d) - 1, 0)
        keep = np.sum(m * m, axis=1) <= corr_cells**2
    else:
        keep = np.sum(d * d, axis=1) <= (r + np.sqrt(3.0)) ** 2
    return d[keep].astype(np.int32)


def knn_query_index(
    index: KnnIndex,
    query: jnp.ndarray,  # [Q, 3]
    k: int,
    cell_size: float,
    query_batch: Optional[jnp.ndarray] = None,
    cell_cap: int = 32,
    query_chunk: int = 8192,
    depth: int = 16,
    ring_radius: int = 1,
    verify_codes: bool = True,
    lattice_origin=None,
    ring_corr_cells: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Query a prebuilt index. ``cell_size``/``cell_cap``/``depth``/
    ``lattice_origin`` must match the build. Queries whose ring falls outside
    the index's code domain miss (they can have no in-range base neighbor by
    construction of the origin).

    ``verify_codes=False`` drops the per-candidate cell-code equality check:
    a candidate window that spills past its run's end lands on OTHER cells'
    (real, valid) points whose exact distances still rank correctly, and
    invalid rows carry position 1e9 — so for pure nearest-neighbor semantics
    the check is redundant.  It is REQUIRED when batch separation matters
    (the code carries the batch id) — keep it on for batched queries.
    """
    from .codes import code_or_batch
    from .serialization import z_order_encode

    single_lane = index.pad_hi is None
    n = index.packed.shape[0] - cell_cap
    nq = query.shape[0]
    qb = query_batch if query_batch is not None else jnp.zeros((nq,), jnp.int32)
    inv = 1.0 / cell_size
    shifted = query if lattice_origin is None else query - jnp.asarray(lattice_origin, query.dtype)
    qcell = jnp.floor(shifted * inv).astype(jnp.int32) - index.origin

    offs = _ring_offsets(ring_radius, corr_cells=ring_corr_cells)
    n_off = offs.shape[0]
    qc = qcell[:, None, :] + jnp.asarray(offs)[None, :, :]  # [Q, n_off, 3]
    q_in = jnp.all((qc >= 0) & (qc < (1 << depth)), axis=-1).reshape(-1)
    qcode = code_or_batch(
        z_order_encode(jnp.clip(qc, 0, (1 << depth) - 1).reshape(-1, 3), depth),
        jnp.broadcast_to(qb[:, None], (nq, n_off)).reshape(-1),
        depth,
    )
    # out-of-domain ring cells -> the sentinel code (never matches a live base)
    qlo = jnp.where(q_in, qcode.lo, jnp.uint32(0xFFFFFFFF))
    if single_lane:
        qhi = None
    else:
        qhi = jnp.where(q_in, qcode.hi, jnp.uint32(0xFFFFFFFF))

    class _View(NamedTuple):
        hi: jnp.ndarray
        lo: jnp.ndarray

    scode_view = _View(
        hi=None if single_lane else jax.lax.slice_in_dim(index.pad_hi, 0, n),
        lo=jax.lax.slice_in_dim(index.pad_lo, 0, n),
    )
    # chunk the join over offset groups: ONE [n + nq*n_off]-element sort is a
    # compile-time bomb on backends whose compile scales with tensor size
    # (ops/sparse.py's kernel-map lesson); a scanned 27-offset chunk compiles
    # once and loops, at the same total runtime
    chunk_off = 27
    if n_off > chunk_off:
        nck = -(-n_off // chunk_off)
        padk = nck * chunk_off
        qlo_m = qlo.reshape(nq, n_off)
        qlo_m = jnp.concatenate(
            [qlo_m, jnp.full((nq, padk - n_off), 0xFFFFFFFF, jnp.uint32)], axis=1
        )
        qlo_c = qlo_m.reshape(nq, nck, chunk_off).transpose(1, 0, 2).reshape(nck, -1)
        if single_lane:
            def body(carry, ql):
                return carry, _run_head_lookup(scode_view, None, ql, n)

            _, head_c = jax.lax.scan(body, None, qlo_c)
        else:
            qhi_m = qhi.reshape(nq, n_off)
            qhi_m = jnp.concatenate(
                [qhi_m, jnp.full((nq, padk - n_off), 0xFFFFFFFF, jnp.uint32)], axis=1
            )
            qhi_c = qhi_m.reshape(nq, nck, chunk_off).transpose(1, 0, 2).reshape(nck, -1)

            def body(carry, qs):
                qh, ql = qs
                return carry, _run_head_lookup(scode_view, qh, ql, n)

            _, head_c = jax.lax.scan(body, None, (qhi_c, qlo_c))
        head = (
            head_c.reshape(nck, nq, chunk_off).transpose(1, 0, 2).reshape(nq, padk)[:, :n_off]
        )
    else:
        head = _run_head_lookup(scode_view, qhi, qlo, n).reshape(nq, n_off)

    qlo2 = qlo.reshape(nq, n_off)
    qhi2 = None if single_lane else qhi.reshape(nq, n_off)

    def block(args):
        q_blk, head_blk, qhi_blk, qlo_blk = args
        m = q_blk.shape[0]
        rows = head_blk[:, :, None] + jnp.arange(cell_cap, dtype=jnp.int32)  # [m, n_off, cap]
        rows = rows.reshape(m, n_off * cell_cap)
        t = jnp.take(index.packed, rows, axis=0)  # [m, C, 8] ONE wide gather
        pos = t[..., :3]
        cand = t[..., 3].astype(jnp.int32)
        d = jnp.sum(jnp.square(pos - q_blk[:, None, :].astype(jnp.float32)), axis=-1)
        if verify_codes:
            c_lo = jax.lax.bitcast_convert_type(t[..., 4], jnp.uint32)
            ok = c_lo == jnp.repeat(qlo_blk, cell_cap, axis=1)
            if qhi_blk is not None:
                c_hi = jax.lax.bitcast_convert_type(t[..., 5], jnp.uint32)
                ok &= c_hi == jnp.repeat(qhi_blk, cell_cap, axis=1)
            d = jnp.where(ok, d, _BIG)
        # k argmax-extraction passes instead of lax.top_k's sort lowering
        neg_top, top_i = small_top_k(-d, k)
        idx = jnp.take_along_axis(cand, top_i, axis=1)
        dist = -neg_top
        # repeat-nearest fill for missing slots
        idx = jnp.where(dist < _BIG, idx, idx[:, :1])
        return idx, dist

    chunk = min(query_chunk, nq)
    nblk = -(-nq // chunk)
    pad_q = nblk * chunk
    if pad_q != nq:
        query_p = jnp.pad(query, ((0, pad_q - nq), (0, 0)))
        head_p = jnp.pad(head, ((0, pad_q - nq), (0, 0)), constant_values=n)
        qlo_p = jnp.pad(qlo2, ((0, pad_q - nq), (0, 0)), constant_values=1)
        qhi_p = None if single_lane else jnp.pad(qhi2, ((0, pad_q - nq), (0, 0)))
    else:
        query_p, head_p, qhi_p, qlo_p = query, head, qhi2, qlo2
    if nblk == 1:
        idx, dist = block((query_p, head_p, qhi_p, qlo_p))
    else:
        if single_lane:
            idx, dist = jax.lax.map(
                lambda a: block((a[0], a[1], None, a[2])),
                (
                    query_p.reshape(nblk, chunk, 3),
                    head_p.reshape(nblk, chunk, n_off),
                    qlo_p.reshape(nblk, chunk, n_off),
                ),
            )
        else:
            idx, dist = jax.lax.map(
                block,
                (
                    query_p.reshape(nblk, chunk, 3),
                    head_p.reshape(nblk, chunk, n_off),
                    qhi_p.reshape(nblk, chunk, n_off),
                    qlo_p.reshape(nblk, chunk, n_off),
                ),
            )
        idx = idx.reshape(pad_q, k)
        dist = dist.reshape(pad_q, k)
    return idx[:nq], dist[:nq]


def knn_bucketed(
    query: jnp.ndarray,  # [Q, 3]
    base: jnp.ndarray,  # [N, 3]
    k: int,
    cell_size: float,
    query_batch: Optional[jnp.ndarray] = None,
    base_batch: Optional[jnp.ndarray] = None,
    base_valid: Optional[jnp.ndarray] = None,
    cell_cap: int = 32,
    query_chunk: int = 8192,
    depth: int = 16,
    single_lane: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Grid-bucketed k-NN. Returns (idx int32[Q, k], sqdist f32[Q, k]).

    Exact iff every query's k-th neighbor is within L-inf ``cell_size`` and no
    inspected cell holds more than ``cell_cap`` points; under-filled queries
    carry ``sqdist >= _BIG`` in the missing slots (idx falls back to the
    nearest found candidate, mirroring ball_query's repeat-first semantics).
    One-shot wrapper over build_knn_index + knn_query_index; loops that query
    the same base repeatedly should hoist the build.
    """
    index = build_knn_index(
        base, cell_size, base_batch, base_valid, cell_cap=cell_cap, depth=depth,
        single_lane=single_lane,
    )
    return knn_query_index(
        index, query, k, cell_size, query_batch=query_batch, cell_cap=cell_cap,
        query_chunk=query_chunk, depth=depth,
    )


def ball_query(
    query: jnp.ndarray,
    base: jnp.ndarray,
    radius: float,
    k: int,
    query_batch: Optional[jnp.ndarray] = None,
    base_batch: Optional[jnp.ndarray] = None,
    base_valid: Optional[jnp.ndarray] = None,
    bucketed: bool = False,
    cell_cap: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k neighbors within ``radius`` (missing -> nearest-neighbor fill, matching
    pointops ball_query's repeat-first-hit semantics). Returns (idx, mask).

    ``bucketed=True`` buckets at cell size ``radius`` — the 27-cell ring then
    covers the whole ball, so every within-radius hit is found (exact unless a
    cell overflows ``cell_cap``; overflow drops the farthest candidates, which
    matches ball query's arbitrary-k-subset contract).  O(Q*27*cap) instead of
    O(Q*N).  Only the out-of-radius FILL index differs from the brute path
    (nearest found candidate vs global nearest) — callers gate on the mask.
    """
    if bucketed:
        idx, sqdist = knn_bucketed(
            query, base, k, radius, query_batch, base_batch, base_valid, cell_cap=cell_cap
        )
    else:
        idx, sqdist = knn(query, base, k, query_batch, base_batch, base_valid)
    within = sqdist <= radius * radius
    fill = idx[:, :1]
    idx = jnp.where(within, idx, fill)
    return idx, within


def three_nn_interpolate(
    query: jnp.ndarray,  # [Q, 3] target positions
    base: jnp.ndarray,  # [N, 3] source positions
    feat: jnp.ndarray,  # [N, C] source features
    query_batch: Optional[jnp.ndarray] = None,
    base_batch: Optional[jnp.ndarray] = None,
    base_valid: Optional[jnp.ndarray] = None,
    cell_size: float = 0.0,
    cell_cap: int = 64,
) -> jnp.ndarray:
    """Inverse-distance weighted 3-NN interpolation (pointops `interpolation`).

    ``cell_size > 0`` switches to the grid-bucketed search (exact while the
    3rd-nearest source lies within L-inf ``cell_size``; unpooling callers pass
    the coarse level's grid pitch, which bounds source spacing by
    construction).  Missing slots carry ~zero inverse-distance weight — the
    graceful-degradation contract of ``knn_bucketed``.
    """
    if cell_size > 0:
        idx, sqdist = knn_bucketed(
            query, base, 3, cell_size, query_batch, base_batch, base_valid, cell_cap=cell_cap
        )
    else:
        idx, sqdist = knn(query, base, 3, query_batch, base_batch, base_valid)
    inv = 1.0 / jnp.maximum(sqdist, 1e-8)
    w = inv / jnp.sum(inv, axis=-1, keepdims=True)
    gathered = jnp.take(feat, idx, axis=0)  # [Q, 3, C]
    return jnp.sum(gathered * w[..., None], axis=1)
