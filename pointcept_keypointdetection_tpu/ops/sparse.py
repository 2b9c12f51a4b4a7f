"""Gather-scatter submanifold sparse convolution.

The TPU-native replacement for spconv's SubMConv3d / SparseConv3d /
SparseInverseConv3d (used by SpUNet `sparse_unet/spconv_unet_v1m1_base.py`,
the PTv3 stem/xCPE `point_transformer_v3m1_base.py:277-287,485-515`).

Design (sorted-code kernel maps instead of GPU hash tables):

* Active voxels carry batch-prefixed Morton codes.  A per-stage sorted code
  array + permutation is built once and cached (the analogue of spconv's
  ``indice_key`` map reuse).
* The kernel map for an offset set is a static ``int32[N, K]`` table of
  neighbor row indices (``N`` = capacity sentinel for missing neighbors),
  found by lexicographic binary search in the sorted codes.
* The convolution itself is K gather + matmul accumulations on the MXU, or a
  single im2col matmul when ``K * C_in`` is small (stem-sized kernels).

Compute cost: the matmuls are dense [N, Cin] x [Cin, Cout] — exactly MXU
shaped; no scalar loops, no dynamic shapes.
"""

from __future__ import annotations

import functools
import itertools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .codes import Code64, code_fill_invalid, code_lexsort, code_take, searchsorted_code
from .serialization import z_order_encode


class SparseConvSpec(NamedTuple):
    """Static description of a conv neighborhood."""

    offsets: Tuple[Tuple[int, int, int], ...]  # K spatial offsets

    @staticmethod
    def cube(kernel_size: int) -> "SparseConvSpec":
        """Centered k^3 neighborhood, matching spconv SubMConv3d (odd k)."""
        assert kernel_size % 2 == 1
        r = kernel_size // 2
        offs = tuple(itertools.product(range(-r, r + 1), repeat=3))
        return SparseConvSpec(offsets=offs)


class KernelMap(NamedTuple):
    neighbor_idx: jnp.ndarray  # int32[N, K]; value N = missing neighbor


class SortedVoxelIndex(NamedTuple):
    """Sorted-code lookup structure over the active voxels (cached per stage)."""

    sorted_code: Code64  # [N] ascending, invalid = CODE_MAX at the end
    perm: jnp.ndarray  # int32[N], sorted position -> voxel row


def build_voxel_index(
    grid_coord: jnp.ndarray,
    batch: jnp.ndarray,
    valid: jnp.ndarray,
    depth: int = 16,
    single_lane: bool = False,
    precomputed_perm: Optional[jnp.ndarray] = None,
) -> SortedVoxelIndex:
    """Build the sorted Morton-code index of active voxels.

    ``precomputed_perm``: an argsort by batch-major z-order (e.g. the model's
    own serialization order 0) — skips the sort.  Because the serialization
    fill keeps batch bits on invalid rows, the reused permutation interleaves
    invalid runs at batch boundaries instead of globally last; that is valid
    for the ``sortmerge`` kernel-map method (which re-sorts and only needs
    invalid EXCLUSION) but NOT for ``bsearch``.
    """
    from .codes import code_or_batch

    code = z_order_encode(grid_coord, depth)
    code = code_or_batch(code, batch, depth)
    code = code_fill_invalid(code, valid)
    if precomputed_perm is not None:
        perm = precomputed_perm.astype(jnp.int32)
    elif single_lane:
        iota = jnp.arange(code.lo.shape[0], dtype=jnp.int32)
        _, perm = jax.lax.sort((code.lo, iota), num_keys=1, is_stable=True)
    else:
        perm = code_lexsort(code)
    return SortedVoxelIndex(sorted_code=code_take(code, perm), perm=perm)


def kmap_single_lane(depth: int, num_samples: int) -> bool:
    """True when (batch, z-code) fits one uint32 lane with the sentinel free.

    Kernel-map codes only need injectivity (not serialization parity), so a
    caller whose grids are bounded by 2^depth per axis can pick a small depth
    and halve the sort-merge join's key width.  3*depth + batch bits <= 31
    keeps 0xFFFFFFFF exclusively for the invalid sentinel.
    """
    return 3 * depth + max(int(num_samples - 1).bit_length(), 0) <= 31


def build_kernel_map(
    index: SortedVoxelIndex,
    grid_coord: jnp.ndarray,
    batch: jnp.ndarray,
    valid: jnp.ndarray,
    spec: SparseConvSpec,
    depth: int = 16,
    method: Optional[str] = None,
    single_lane: bool = False,
) -> KernelMap:
    """For each voxel and each offset, find the neighbor's row index (or N).

    Methods (measured @102k on the round-1 backend, halved k=3):

    * ``sortmerge`` (default, 70 ms): Minuet-style — concatenate target and
      query codes, one stable lexsort + running-max scan recovers every
      query's equal-key target.  No data-dependent gathers; rides the TPU's
      fast sort path.
    * ``hash`` (193 ms): open-addressing hash table over the active voxel
      codes (double hashing, fingerprint-packed entries, exact-code verify);
      probe loops are ``lax.while_loop``s, so the cost is the ~2-3 rounds that
      actually run.  The closest analogue of spconv's GPU hash tables; much
      cheaper to compile than sortmerge (1 s vs ~2 min).
    * ``bsearch`` (383 ms): log(N)-round lexicographic binary search in the
      sorted code index (exact oracle, no hash/sort assumptions).
    """
    from .codes import code_or_batch

    if method is None:
        import os

        method = os.environ.get("PKT_KMAP_METHOD", "sortmerge")
    n = grid_coord.shape[0]
    offs = np.asarray(spec.offsets, np.int32)  # [K, 3]
    k = offs.shape[0]

    # Symmetric-offset halving: map[i][d] = j  <=>  map[j][-d] = i, so only
    # offsets with positive lexicographic direction need searching; the
    # mirrored half is recovered by one scatter per column.  Cuts the
    # dominant search cost 2x for centered cubes.  Applies to every method.
    opposite = {}
    for ki, o in enumerate(map(tuple, offs)):
        neg = tuple(-x for x in o)
        if neg in spec.offsets:
            opposite[ki] = spec.offsets.index(neg)
    can_halve = not method.endswith("_nohalve") and len(opposite) == k and k > 1
    if can_halve:
        iota = jnp.arange(n, dtype=jnp.int32)
        search_cols = [
            ki for ki, o in enumerate(map(tuple, offs))
            if o > tuple(-x for x in o)  # strictly positive direction; identity excluded
        ]
        sub_spec = SparseConvSpec(offsets=tuple(tuple(offs[ki]) for ki in search_cols))
        half = build_kernel_map(
            index, grid_coord, batch, valid, sub_spec, depth,
            method=method + "_nohalve", single_lane=single_lane,
        )
        neighbor = jnp.full((n, k), n, jnp.int32)
        for slot, ki in enumerate(search_cols):
            col = half.neighbor_idx[:, slot]
            neighbor = neighbor.at[:, ki].set(col)
            # scatter transpose: where col[i] = j (hit), neighbor[j, -d] = i
            tgt = jnp.where(col < n, col, n)
            neighbor = neighbor.at[tgt, opposite[ki]].set(iota, mode="drop")
        # identity offset needs no search
        for ki, o in enumerate(map(tuple, offs)):
            if o == (0, 0, 0):
                neighbor = neighbor.at[:, ki].set(jnp.where(valid, iota, n))
        return KernelMap(neighbor_idx=neighbor)
    if method.endswith("_nohalve"):
        method = method[: -len("_nohalve")]
    if method == "hash":
        return _hash_kernel_map(index, grid_coord, batch, valid, spec, depth)

    # Query codes for all (point, offset) pairs: [N*K]
    qcoord = grid_coord[:, None, :].astype(jnp.int32) + jnp.asarray(offs)[None, :, :]
    # negative coords never exist as keys (grid starts at 0); clamp to keep the
    # uint cast harmless, and kill the lookup via the validity check below.
    in_range = jnp.all(qcoord >= 0, axis=-1) & valid[:, None]
    qcode = z_order_encode(jnp.maximum(qcoord, 0).reshape(-1, 3), depth)
    qbatch = jnp.broadcast_to(batch[:, None], (n, k)).reshape(-1)
    qcode = code_or_batch(qcode, qbatch, depth)

    if method == "bsearch":
        pos = searchsorted_code(index.sorted_code, qcode, side="left")
        pos = jnp.minimum(pos, n - 1)
        found_hi = jnp.take(index.sorted_code.hi, pos, axis=0)
        found_lo = jnp.take(index.sorted_code.lo, pos, axis=0)
        hit = (found_hi == qcode.hi) & (found_lo == qcode.lo) & in_range.reshape(-1)
        row = jnp.take(index.perm, pos, axis=0)
        neighbor = jnp.where(hit, row, n).astype(jnp.int32)
        return KernelMap(neighbor_idx=neighbor.reshape(n, k))

    # ---- sort-merge path ------------------------------------------------
    # Chunk the offsets so every lexsort in the program has one of a few
    # canonical shapes (a single 13M-element variadic sort is a TPU
    # compile-time bomb; a scanned 27-offset chunk compiles once and loops).
    import os as _os

    chunk = min(k, int(_os.environ.get("PKT_KMAP_CHUNK", "27")))
    nchunks = -(-k // chunk)
    pad_k = nchunks * chunk
    qhi = qcode.hi.reshape(n, k)
    qlo = qcode.lo.reshape(n, k)
    if pad_k != k:
        fill_hi = jnp.full((n, pad_k - k), 0xFFFFFFFF, jnp.uint32)
        qhi = jnp.concatenate([qhi, fill_hi], axis=1)
        qlo = jnp.concatenate([qlo, fill_hi], axis=1)
    # [nchunks, n*chunk] with query id preserved by position
    qhi_c = qhi.reshape(n, nchunks, chunk).transpose(1, 0, 2).reshape(nchunks, n * chunk)
    qlo_c = qlo.reshape(n, nchunks, chunk).transpose(1, 0, 2).reshape(nchunks, n * chunk)

    def lookup(carry, qs):
        chi, clo = qs
        rows = _sortmerge_lookup(index, chi, clo, n, single_lane)
        return carry, rows

    _, rows_c = jax.lax.scan(lookup, None, (qhi_c, qlo_c))
    neighbor = rows_c.reshape(nchunks, n, chunk).transpose(1, 0, 2).reshape(n, pad_k)[:, :k]
    neighbor = jnp.where(in_range, neighbor, n).astype(jnp.int32)
    return KernelMap(neighbor_idx=neighbor)


class ParentCellIndex(NamedTuple):
    """Two-level lookup: 2^shift-coarse cells + per-cell subvoxel table.

    Built once per resolution; any kernel map with radius <= 2^shift is then
    derived by static LUT gathers (`derive_kernel_map`) instead of its own
    sort-merge join.  The payoff: a k=5 stem map (62 searched offsets ~ 5x a
    k=3 join) becomes ONE k=3 join over coarse cells plus O(K*N) gathers, and
    the stage's k=3 xCPE map falls out of the same structure for free.
    Replaces spconv's per-kernel-size hash-table indice builds
    (`point_transformer_v3m1_base.py:485-515` stem k=5 + `:277-287` xCPE k=3).
    """

    shift: int  # cell = voxel >> shift
    cell_kmap: jnp.ndarray  # int32[N, 27] cell -> neighbor cell id (N = miss)
    cell_table: jnp.ndarray  # int32[N + 1, 8**shift] (cell, subpos) -> voxel row
    cell_of: jnp.ndarray  # int32[N] voxel row -> own cell id (invalid -> N)
    parity: jnp.ndarray  # int32[N] voxel row -> subposition within its cell


def build_parent_index(
    grid_coord: jnp.ndarray,
    batch: jnp.ndarray,
    valid: jnp.ndarray,
    shift: int = 1,
    depth: int = 16,
    method: Optional[str] = None,
    single_lane: bool = False,
    precomputed_perm: Optional[jnp.ndarray] = None,
) -> ParentCellIndex:
    """Build the coarse-cell structure over active voxels.

    ``precomputed_perm``: a batch-major fine-z argsort (the serialization's
    order 0) — valid here because coarse z-codes are a bit-prefix of fine
    z-codes (Morton property: z(c >> s) = z(c) >> 3s), so fine order IS
    coarse order with stable ties; equal-code cell runs stay contiguous even
    with the serialization's per-batch invalid placement.
    """
    from .codes import code_or_batch

    n = grid_coord.shape[0]
    side = 1 << shift
    nsub = side**3
    ccoord = grid_coord >> shift
    sub = grid_coord & (side - 1)
    parity = (sub[:, 0] * side + sub[:, 1]) * side + sub[:, 2]  # [N] in [0, nsub)

    ccode = code_or_batch(z_order_encode(ccoord, depth), batch, depth)
    ccode = code_fill_invalid(ccode, valid)
    if precomputed_perm is not None:
        perm = precomputed_perm.astype(jnp.int32)
    elif single_lane:
        iota_s = jnp.arange(n, dtype=jnp.int32)
        _, perm = jax.lax.sort((ccode.lo, iota_s), num_keys=1, is_stable=True)
    else:
        perm = code_lexsort(ccode)
    sc = code_take(ccode, perm)
    invalid_sorted = (sc.hi == jnp.uint32(0xFFFFFFFF)) & (sc.lo == jnp.uint32(0xFFFFFFFF))
    prev_hi = jnp.concatenate([jnp.uint32([0xFFFFFFFF]), sc.hi[:-1]])
    prev_lo = jnp.concatenate([jnp.uint32([0xFFFFFFFF]), sc.lo[:-1]])
    is_head = ((sc.hi != prev_hi) | (sc.lo != prev_lo)) & ~invalid_sorted
    is_head = is_head.at[0].set(~invalid_sorted[0])
    cell_id_sorted = jnp.cumsum(is_head.astype(jnp.int32)) - 1  # [N], -1 for leading invalids

    # cell-indexed arrays (cells were discovered in ascending code order, so
    # cell id order IS sorted-code order: the coarse SortedVoxelIndex is free)
    head_target = jnp.where(is_head, cell_id_sorted, n)
    cell_hi = jnp.full((n,), 0xFFFFFFFF, jnp.uint32).at[head_target].set(sc.hi, mode="drop")
    cell_lo = jnp.full((n,), 0xFFFFFFFF, jnp.uint32).at[head_target].set(sc.lo, mode="drop")
    head_row = jnp.full((n,), 0, jnp.int32).at[head_target].set(perm.astype(jnp.int32), mode="drop")
    cell_grid = jnp.take(ccoord, head_row, axis=0)
    cell_batch = jnp.take(batch, head_row, axis=0)
    num_cells = jnp.sum(is_head.astype(jnp.int32))
    cell_valid = jnp.arange(n, dtype=jnp.int32) < num_cells

    cell_of = (
        jnp.full((n,), n, jnp.int32)
        .at[perm]
        .set(jnp.where(cell_id_sorted >= 0, cell_id_sorted, n), mode="drop")
    )
    rows = jnp.arange(n, dtype=jnp.int32)
    flat_slot = jnp.where(valid, cell_of * nsub + parity, (n + 1) * nsub)
    cell_table = (
        jnp.full(((n + 1) * nsub,), n, jnp.int32)
        .at[flat_slot]
        .set(rows, mode="drop")
        .reshape(n + 1, nsub)
    )

    cindex = SortedVoxelIndex(sorted_code=Code64(hi=cell_hi, lo=cell_lo), perm=rows)
    ckmap = build_kernel_map(
        cindex, cell_grid, cell_batch, cell_valid, SparseConvSpec.cube(3), depth,
        method=method, single_lane=single_lane,
    )
    return ParentCellIndex(
        shift=shift,
        cell_kmap=ckmap.neighbor_idx,
        cell_table=cell_table,
        cell_of=cell_of,
        parity=parity,
    )


def derive_kernel_map(
    parent: ParentCellIndex, valid: jnp.ndarray, spec: SparseConvSpec
) -> KernelMap:
    """Derive a fine-resolution kernel map from the coarse structure.

    For voxel q with cell parity p and offset d:  q + d = (cell(q) + cj)
    * 2^shift + s  where (cj, s) are STATIC functions of (p, d) — so the map
    is two gathers through precomputed [nsub, K] LUTs.  Exact for any offset
    with max |d| <= 2^shift.
    """
    n = parent.cell_of.shape[0]
    shift = parent.shift
    side = 1 << shift
    nsub = side**3
    offs = np.asarray(spec.offsets, np.int32)  # [K, 3]
    k = offs.shape[0]
    assert np.abs(offs).max() <= side, (offs.min(), offs.max(), side)

    # LUTs over (parity p, offset slot): which coarse neighbor column, which subpos
    ps = np.stack(np.meshgrid(np.arange(side), np.arange(side), np.arange(side), indexing="ij"), -1).reshape(nsub, 3)
    q = ps[:, None, :] + offs[None, :, :]  # [nsub, K, 3]
    cj = q >> shift  # floor division, in [-1, 1]
    s = q & (side - 1)
    assert cj.min() >= -1 and cj.max() <= 1
    cell_col = ((cj[..., 0] + 1) * 3 + (cj[..., 1] + 1)) * 3 + (cj[..., 2] + 1)  # [nsub, K]
    sub_idx = (s[..., 0] * side + s[..., 1]) * side + s[..., 2]  # [nsub, K]
    cell_col_lut = jnp.asarray(cell_col, jnp.int32)
    sub_lut = jnp.asarray(sub_idx, jnp.int32)

    own_cells = jnp.take(parent.cell_kmap, jnp.minimum(parent.cell_of, n - 1), axis=0)  # [N, 27]
    cols = jnp.take(cell_col_lut, parent.parity, axis=0)  # [N, K]
    subs = jnp.take(sub_lut, parent.parity, axis=0)  # [N, K]
    ncell = jnp.take_along_axis(own_cells, cols, axis=1)  # [N, K] in [0, N]
    neighbor = jnp.take(
        parent.cell_table.reshape(-1), jnp.minimum(ncell, n) * nsub + subs, axis=0
    )
    neighbor = jnp.where(valid[:, None] & (parent.cell_of[:, None] < n), neighbor, n)
    # materialize: without the barrier XLA fuses this two-level gather chain
    # into every consumer (the conv's K feature gathers), recomputing it per
    # consumer — measured 4x slower fused than decomposed on the bench backend
    neighbor = jax.lax.optimization_barrier(neighbor.astype(jnp.int32))
    return KernelMap(neighbor_idx=neighbor)


def pooled_kernel_map(
    parent: ParentCellIndex,
    parent_row: jnp.ndarray,  # int32[N] fine row -> pooled row (sentinel m)
    head_row: jnp.ndarray,  # int32[M] pooled row -> fine head row (sentinel n)
    fine_valid: jnp.ndarray,  # bool[N]
    pooled_valid: jnp.ndarray,  # bool[M]
) -> KernelMap:
    """The POOLED level's k=3 kernel map, derived from the fine level's
    parent-cell structure — no join at the pooled level at all.

    Key fact: stride-2 pooling clusters by ``grid >> 1`` (SerializedPooling),
    which is exactly the shift-1 parent CELL partition — so the coarse k=3
    join computed by ``build_parent_index`` at the fine level (``cell_kmap``)
    IS the pooled level's kernel map, up to the cell-id -> pooled-row
    relabeling.  The relabeling costs one [N] scatter + two narrow gathers
    (~2 ms @102k) where a fresh pooled-level join costs ~5 ms @25.6k; the
    win compounds down the pyramid.  The analogue of spconv reusing
    ``indice_key`` maps across strided stages.
    """
    n = parent.cell_of.shape[0]
    m = head_row.shape[0]
    # cell id -> pooled row: every valid fine row of a cell agrees on both
    tgt = jnp.where(fine_valid, parent.cell_of, n)
    pooled_of_cell = (
        jnp.full((n + 1,), m, jnp.int32).at[tgt].set(parent_row.astype(jnp.int32), mode="drop")
    )
    # pooled row -> its cell id (via the head fine row)
    head = jnp.minimum(head_row, n - 1)
    cid = jnp.where(pooled_valid, jnp.take(parent.cell_of, head, axis=0), n)
    nbr_cells = jnp.take(parent.cell_kmap, jnp.minimum(cid, n - 1), axis=0)  # [M, 27]
    nbr_cells = jnp.where(pooled_valid[:, None] & (cid[:, None] < n), nbr_cells, n)
    kmap = jnp.take(pooled_of_cell, jnp.minimum(nbr_cells, n), axis=0)
    kmap = jnp.where(nbr_cells < n, kmap, m)
    # materialize: as with derive_kernel_map, without the barrier XLA fuses
    # the scatter+gather chain into every consumer conv and recomputes it
    kmap = jax.lax.optimization_barrier(kmap.astype(jnp.int32))
    return KernelMap(neighbor_idx=kmap)


def cell_packed_conv(
    feat: jnp.ndarray,  # [N, Cin]
    parent: ParentCellIndex,
    valid: jnp.ndarray,  # bool[N]
    weight: jnp.ndarray,  # [K, Cin, Cout] in spec.offsets (canonical cube) order
    spec: SparseConvSpec,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Submanifold conv computed at the coarse-cell level (large kernels).

    The direct path (``derive_kernel_map`` + ``sparse_conv``) gathers K rows
    per point — 125 at k=5 — and on gather-row-bound backends the im2col
    dominates the forward.  This path gathers each point's 27 neighbor CELLS
    (rows of ``nsub*Cin``) from a cell-feature table instead — K/27x fewer
    gathered rows — and moves the offset selection into an MXU contraction
    with a parity-expanded weight:

        out[i] = sum_{j<27, s<nsub} table[cell_nbr(i, j), s] . W'[parity_i, j, s]

    where ``W'[p, j, s] = weight[d]`` for the fine offset
    ``d = cell_offset(j) * side + sub(s) - sub(p)`` (zero outside the kernel).
    Exact same semantics as the derived-map conv (property-tested); the
    redundant FLOPs (nsub x) ride the MXU.  Replaces spconv's k=5 stem
    (`point_transformer_v3m1_base.py:485-515`) at the reference workload.
    """
    n, cin = feat.shape
    k_total, _, cout = weight.shape
    shift = parent.shift
    side = 1 << shift
    nsub = side**3
    offs = np.asarray(spec.offsets, np.int32)
    r = int(np.abs(offs).max())
    assert r <= side, (r, side)
    assert k_total == offs.shape[0]

    # static (parity, cell column, subpos) -> kernel-offset slot (or K = zero)
    ps = np.stack(
        np.meshgrid(np.arange(side), np.arange(side), np.arange(side), indexing="ij"), -1
    ).reshape(nsub, 3)
    cj = np.stack(
        np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1], indexing="ij"), -1
    ).reshape(27, 3)
    d = cj[None, :, None, :] * side + ps[None, None, :, :] - ps[:, None, None, :]  # [p, j, s, 3]
    in_range = np.all(np.abs(d) <= r, axis=-1)
    kdim = 2 * r + 1
    slot = ((d[..., 0] + r) * kdim + (d[..., 1] + r)) * kdim + (d[..., 2] + r)
    slot = np.where(in_range, slot, k_total).astype(np.int32)  # [nsub, 27, nsub]

    weight = weight.astype(feat.dtype)
    weight_pad = jnp.concatenate([weight, jnp.zeros((1, cin, cout), weight.dtype)], axis=0)
    w_exp = jnp.take(weight_pad, jnp.asarray(slot.reshape(nsub, -1)), axis=0)  # [p, 27*nsub, Cin, Cout]

    # cell feature table: [(n+1) * nsub] rows; invalid/missing -> zero row
    feat_pad = jnp.concatenate(
        [jnp.where(valid[:, None], feat, 0), jnp.zeros((1, cin), feat.dtype)], axis=0
    )
    table = jnp.take(feat_pad, parent.cell_table, axis=0)  # [n+1, nsub, Cin]
    nbr = jnp.take(parent.cell_kmap, jnp.minimum(parent.cell_of, n - 1), axis=0)  # [N, 27]
    nbr = jnp.where(valid[:, None] & (parent.cell_of[:, None] < n), nbr, n)
    gathered = jnp.take(table.reshape(n + 1, nsub * cin), nbr, axis=0)  # [N, 27, nsub*Cin]
    gathered = gathered.reshape(n, 27 * nsub, cin)

    out_all = jnp.einsum(
        "nkc,pkcd->npd", gathered, w_exp, preferred_element_type=jnp.float32
    )  # [N, nsub, Cout]
    out = jnp.take_along_axis(out_all, parent.parity[:, None, None], axis=1)[:, 0]
    out = out.astype(feat.dtype)
    if bias is not None:
        out = out + bias.astype(feat.dtype)
    return out


def cell_select_conv(
    feat: jnp.ndarray,  # [N, Cin]
    parent: ParentCellIndex,
    valid: jnp.ndarray,  # bool[N]
    weight: jnp.ndarray,  # [K, Cin, Cout] in spec.offsets (canonical cube) order
    spec: SparseConvSpec,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Cell-gathered submanifold conv with MXU one-hot offset selection.

    Same 27-neighbor-cell gather as ``cell_packed_conv`` (K/27x fewer
    gathered rows than per-point im2col), but instead of a parity-expanded
    weight (nsub-x redundant FLOPs in the contraction), the K kernel taps
    are SELECTED out of the 27*nsub gathered fine positions by a one-hot
    matmul (selection LUT depends only on the point's parity), then one
    shared [K*Cin, Cout] matmul applies the weight:

        selected[n, k, :] = gathered[n, sel(parity_n, k), :]   (one-hot MXU)
        out[n] = selected[n].reshape(K*Cin) @ W

    Measured (@102k): a one-hot-matmul select is ~40x cheaper than
    take_along_axis for this shape, and the two-step contraction does
    K*27*nsub + K*Cin*Cout FLOPs/point vs cell_packed's 27*nsub*Cin*Cout*nsub.
    Exact-equal to cell_packed_conv / the derived-map conv (tested).
    """
    n, cin = feat.shape
    k_total, _, cout = weight.shape
    shift = parent.shift
    side = 1 << shift
    nsub = side**3
    offs = np.asarray(spec.offsets, np.int32)
    r = int(np.abs(offs).max())
    assert r <= side, (r, side)
    assert k_total == offs.shape[0]

    # static (parity, offset slot) -> flat fine position j*nsub + s in the
    # gathered 27-cell block (same math as derive_kernel_map's LUTs)
    ps = np.stack(
        np.meshgrid(np.arange(side), np.arange(side), np.arange(side), indexing="ij"), -1
    ).reshape(nsub, 3)
    q = ps[:, None, :] + offs[None, :, :]  # [nsub, K, 3]
    cj = q >> shift
    s = q & (side - 1)
    cell_col = ((cj[..., 0] + 1) * 3 + (cj[..., 1] + 1)) * 3 + (cj[..., 2] + 1)
    sub_idx = (s[..., 0] * side + s[..., 1]) * side + s[..., 2]
    sel = jnp.asarray((cell_col * nsub + sub_idx).astype(np.int32))  # [nsub, K]

    # cell feature table + 27-neighbor-cell gather (as cell_packed_conv)
    feat_pad = jnp.concatenate(
        [jnp.where(valid[:, None], feat, 0), jnp.zeros((1, cin), feat.dtype)], axis=0
    )
    table = jnp.take(feat_pad, parent.cell_table, axis=0)  # [n+1, nsub, Cin]
    nbr = jnp.take(parent.cell_kmap, jnp.minimum(parent.cell_of, n - 1), axis=0)
    nbr = jnp.where(valid[:, None] & (parent.cell_of[:, None] < n), nbr, n)
    gathered = jnp.take(table.reshape(n + 1, nsub * cin), nbr, axis=0)  # [N, 27, nsub*Cin]
    gathered = gathered.reshape(n, 27 * nsub, cin)

    oh = jax.nn.one_hot(jnp.take(sel, parent.parity, axis=0), 27 * nsub, dtype=feat.dtype)
    selected = jnp.einsum(
        "nkj,njc->nkc", oh, gathered, preferred_element_type=jnp.float32
    ).astype(feat.dtype)
    out = jax.lax.dot_general(
        selected.reshape(n, k_total * cin),
        weight.astype(feat.dtype).reshape(k_total * cin, cout),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(feat.dtype)
    if bias is not None:
        out = out + bias.astype(feat.dtype)
    return out


def _hash_mix(hi: jnp.ndarray, lo: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two independent u32 hashes of a (hi, lo) code (murmur-style finalizers)."""
    h = lo * jnp.uint32(0x9E3779B1) ^ hi * jnp.uint32(0x85EBCA6B)
    h = (h ^ (h >> 15)) * jnp.uint32(0x2C1B3C6D)
    h = (h ^ (h >> 12)) * jnp.uint32(0x297A2D39)
    h = h ^ (h >> 15)
    g = lo * jnp.uint32(0xC2B2AE35) ^ hi * jnp.uint32(0x27D4EB2F)
    g = (g ^ (g >> 13)) * jnp.uint32(0x165667B1)
    g = g ^ (g >> 16)
    return h, g


def _hash_kernel_map(
    index: SortedVoxelIndex,
    grid_coord: jnp.ndarray,
    batch: jnp.ndarray,
    valid: jnp.ndarray,
    spec: SparseConvSpec,
    depth: int,
) -> KernelMap:
    """Hash-table kernel map: O(1) expected probes per query.

    Replaces spconv's GPU hash-table indice-map build
    (`spconv_unet_v1m1_base.py` relies on it via ``indice_key``) with a TPU
    formulation: a double-hashed open-addressing table of (fingerprint | row)
    u32 entries; insert/probe loops are ``lax.while_loop``s whose executed trip
    count is the actual max probe chain (~2-3 at load factor 1/8), not a
    static worst case.  Exactness: every fingerprint hit is verified against
    the stored row's full 64-bit code, and probing continues until an empty
    slot proves a miss — no false positives/negatives by construction.
    """
    from .codes import code_or_batch

    n = grid_coord.shape[0]
    offs = np.asarray(spec.offsets, np.int32)
    k = offs.shape[0]

    # voxel codes (table keys); invalid voxels excluded from insertion
    code = code_or_batch(z_order_encode(grid_coord, depth), batch, depth)
    code = code_fill_invalid(code, valid)

    tbits = max(int(np.ceil(np.log2(max(n, 2)))) + 3, 4)  # load factor <= 1/8
    tsize = 1 << tbits
    tmask = jnp.uint32(tsize - 1)
    rowbits = max(int(np.ceil(np.log2(n + 1))), 1)
    assert rowbits + 1 <= 32, "fingerprint needs at least 1 bit"
    fpmask = jnp.uint32((1 << (32 - rowbits)) - 1)
    rowmask = jnp.uint32((1 << rowbits) - 1)
    empty = jnp.uint32(0xFFFFFFFF)

    def entry_of(h2, row):
        fp = (h2 >> jnp.uint32(rowbits)) & fpmask
        # avoid the all-ones entry colliding with "empty"
        fp = jnp.where((fp == fpmask) & (rowmask == row), fp - 1, fp)
        return (fp << jnp.uint32(rowbits)) | row

    h1, h2 = _hash_mix(code.hi, code.lo)
    step_ins = (h2 | jnp.uint32(1)) & tmask
    rows = jnp.arange(n, dtype=jnp.uint32)
    my_entry = entry_of(h2, rows)

    table = jnp.full((tsize,), empty, jnp.uint32)

    def ins_cond(state):
        table, placed, r = state
        return ~jnp.all(placed)

    def ins_body(state):
        table, placed, r = state
        pos = (h1 + r * step_ins) & tmask
        slot = jnp.take(table, pos.astype(jnp.int32), axis=0)
        attempt = ~placed & (slot == empty)
        tgt = jnp.where(attempt, pos.astype(jnp.int32), tsize)
        table = table.at[tgt].set(my_entry, mode="drop")
        won = attempt & (jnp.take(table, pos.astype(jnp.int32), axis=0) == my_entry)
        return table, placed | won, r + jnp.uint32(1)

    placed0 = ~valid  # invalid rows never insert
    table, _, _ = jax.lax.while_loop(ins_cond, ins_body, (table, placed0, jnp.uint32(0)))

    # ---- queries: all (point, offset) pairs -----------------------------
    qcoord = grid_coord[:, None, :].astype(jnp.int32) + jnp.asarray(offs)[None, :, :]
    in_range = (jnp.all(qcoord >= 0, axis=-1) & valid[:, None]).reshape(-1)
    qcode = z_order_encode(jnp.maximum(qcoord, 0).reshape(-1, 3), depth)
    qbatch = jnp.broadcast_to(batch[:, None], (n, k)).reshape(-1)
    qcode = code_or_batch(qcode, qbatch, depth)

    qh1, qh2 = _hash_mix(qcode.hi, qcode.lo)
    qstep = (qh2 | jnp.uint32(1)) & tmask
    qfp_entry_hi = (qh2 >> jnp.uint32(rowbits)) & fpmask  # candidate fp to match

    nq = n * k
    result0 = jnp.full((nq,), n, jnp.int32)

    def q_cond(state):
        result, resolved, r = state
        return ~jnp.all(resolved)

    def q_body(state):
        result, resolved, r = state
        pos = ((qh1 + r * qstep) & tmask).astype(jnp.int32)
        slot = jnp.take(table, pos, axis=0)
        is_empty = slot == empty
        row = (slot & rowmask).astype(jnp.int32)
        fp = slot >> jnp.uint32(rowbits)
        cand = ~resolved & ~is_empty & ((fp == qfp_entry_hi) | (fp == qfp_entry_hi - 1))
        # exact verify of fingerprint candidates against the stored code
        vrow = jnp.where(cand, row, 0)
        ok = cand & (jnp.take(code.hi, vrow, axis=0) == qcode.hi) & (
            jnp.take(code.lo, vrow, axis=0) == qcode.lo
        )
        result = jnp.where(ok, row, result)
        resolved = resolved | ok | (~resolved & is_empty)
        return result, resolved, r + jnp.uint32(1)

    resolved0 = ~in_range  # out-of-range queries already miss
    result, _, _ = jax.lax.while_loop(q_cond, q_body, (result0, resolved0, jnp.uint32(0)))
    result = jnp.where(in_range, result, n)
    return KernelMap(neighbor_idx=result.reshape(n, k))


def _sortmerge_lookup(
    index: SortedVoxelIndex, qhi: jnp.ndarray, qlo: jnp.ndarray, n: int, single_lane: bool = False
) -> jnp.ndarray:
    """Find equal-key target rows for a flat query code array (n targets).

    Targets are concatenated BEFORE queries and the sort is stable, so
    equal-key targets always precede their queries — no tie-break sort key
    needed (one fewer sort operand).  Target payloads are ``perm`` (< n);
    query payloads are ``n + qid``.  ``single_lane=True`` (codes proven to
    fit one u32, `kmap_single_lane`) drops the hi lane from the sort and the
    scan — ~1/3 fewer sorted/scanned elements."""
    nq = qhi.shape[0]
    lo = jnp.concatenate([index.sorted_code.lo, qlo])
    payload = jnp.concatenate(
        [index.perm.astype(jnp.int32), n + jnp.arange(nq, dtype=jnp.int32)]
    )

    if single_lane:
        s_lo, s_payload = jax.lax.sort((lo, payload), num_keys=1, is_stable=True)
        is_target = s_payload < n
        exclude_invalid = is_target & (s_lo != jnp.uint32(0xFFFFFFFF))

        # 2-operand last-valid scan: the "is a target" flag is folded into
        # the row's sign (row = -1 for queries/invalid targets) — one fewer
        # scanned lane than the (flag, row, lo) formulation (~25% of the
        # join's scan cost on the bench backend)
        def combine1(a, b):
            ra, la = a
            rb, lb = b
            keep_b = rb >= 0
            return (jnp.where(keep_b, rb, ra), jnp.where(keep_b, lb, la))

        run_row, run_lo = jax.lax.associative_scan(
            combine1,
            (jnp.where(exclude_invalid, s_payload, -1), s_lo),
        )
        hit = (run_lo == s_lo) & (~is_target) & (run_row >= 0)
        result_sorted = jnp.where(hit, run_row, n).astype(jnp.int32)
        qid = jnp.where(is_target, nq, s_payload - n)
        return _unscatter_by_sort(qid, result_sorted, nq)

    hi = jnp.concatenate([index.sorted_code.hi, qhi])
    order = jnp.lexsort((lo, hi))
    s_hi = jnp.take(hi, order)
    s_lo = jnp.take(lo, order)
    s_payload = jnp.take(payload, order)

    is_target = s_payload < n
    exclude_invalid = is_target & ~((s_hi == jnp.uint32(0xFFFFFFFF)) & (s_lo == jnp.uint32(0xFFFFFFFF)))

    # running last-target tuple scan.  (A single-operand cummax over target
    # positions + code-recovery gathers was tried and measured 2x SLOWER on
    # the round-1 backend — random gathers cost more than wide scans here.)
    def combine(a, b):
        fa, ra, ha, la = a
        fb, rb, hb, lb = b
        return (
            fa | fb,
            jnp.where(fb, rb, ra),
            jnp.where(fb, hb, ha),
            jnp.where(fb, lb, la),
        )

    _, run_row, run_hi, run_lo = jax.lax.associative_scan(
        combine,
        (exclude_invalid, jnp.where(exclude_invalid, s_payload, -1), s_hi, s_lo),
    )
    hit = (run_hi == s_hi) & (run_lo == s_lo) & (~is_target) & (run_row >= 0)
    result_sorted = jnp.where(hit, run_row, n).astype(jnp.int32)

    qid = jnp.where(is_target, nq, s_payload - n)
    return _unscatter_by_sort(qid, result_sorted, nq)


def _unscatter_by_sort(qid: jnp.ndarray, values: jnp.ndarray, nq: int) -> jnp.ndarray:
    """values -> query order, without a scatter.

    A [14N]-element scatter is 2.5x the cost of a (key, value) sort on this
    backend (measured 5.8 vs 2.3 ms @1.4M); qid is a permutation of
    [0, nq) plus sentinel-nq entries, so a stable sort by qid puts each
    query's value at its own position and the sentinels at the tail."""
    _, out = jax.lax.sort((qid, values), num_keys=1, is_stable=True)
    return jax.lax.slice_in_dim(out, 0, nq)


def _conv_impl() -> str:
    """Conv mechanism: "xla" (gather im2col + matmul) or "pallas" (fused
    VMEM-resident-table kernel, ops/pallas/sparse_conv.py).  Env
    ``PKT_CONV_IMPL`` overrides; "auto" = xla (the measured default on the
    relayed bench chip — flip per-backend when silicon says otherwise).

    The value is read at TRACE time: changing the env var after a conv has
    been jitted/cached in this process has no effect on the cached
    executable — set it before the first forward (bench.py does).  Unknown
    values raise instead of silently falling through to the XLA path."""
    import os

    impl = os.environ.get("PKT_CONV_IMPL", "auto")
    if impl not in ("auto", "xla", "pallas"):
        raise ValueError(
            f"PKT_CONV_IMPL={impl!r} — expected one of 'auto', 'xla', 'pallas'"
        )
    return "xla" if impl == "auto" else impl


def _pallas_conv_fits(n: int, cin: int, k: int, cout: int) -> bool:
    # f32-cast feat table + weight + per-step blocks must fit VMEM (~16 MB/core)
    table = (n + 1) * cin * 4
    return jax.default_backend() == "tpu" and table < 13_500_000 and k * cin * cout * 4 < 2_000_000


def _conv_apply(
    feat: jnp.ndarray, neighbor_idx: jnp.ndarray, weight: jnp.ndarray, im2col_max_width: int
) -> jnp.ndarray:
    """out[i] = sum_d feat[neighbor_idx[i, d]] @ weight[d] (f32 accumulate)."""
    n, cin = feat.shape
    k, _, cout = weight.shape
    if _conv_impl() == "pallas" and _pallas_conv_fits(n, cin, k, cout):
        from .pallas.sparse_conv import fused_subm_conv

        return fused_subm_conv(feat, neighbor_idx, weight.astype(feat.dtype))
    weight = weight.astype(feat.dtype)
    feat_pad = jnp.concatenate([feat, jnp.zeros((1, cin), feat.dtype)], axis=0)
    if k * cin <= im2col_max_width:
        gathered = jnp.take(feat_pad, neighbor_idx, axis=0)  # [N, K, Cin]
        out = jax.lax.dot_general(
            gathered.reshape(n, k * cin),
            weight.reshape(k * cin, cout),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        def body(carry, inputs):
            idx_k, w_k = inputs
            g = jnp.take(feat_pad, idx_k, axis=0)
            return carry + jax.lax.dot_general(
                g, w_k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ), None

        init = jnp.zeros((n, cout), jnp.float32)
        out, _ = jax.lax.scan(body, init, (neighbor_idx.T, weight))
    return out.astype(feat.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _subm_conv_sym(feat, weight, neighbor_idx, im2col_max_width):
    return _conv_apply(feat, neighbor_idx, weight, im2col_max_width)


def _subm_conv_sym_fwd(feat, weight, neighbor_idx, im2col_max_width):
    return _conv_apply(feat, neighbor_idx, weight, im2col_max_width), (feat, weight, neighbor_idx)


def _subm_conv_sym_bwd(im2col_max_width, res, g):
    """Scatter-free backward for symmetric (centered-cube) kernel maps.

    XLA autodiff of the forward gather produces a scatter-add over dL/dfeat —
    scatters are the slowest primitive on the round-1 backend.  For a centered
    cube in canonical `itertools.product` order, offset d's opposite is K-1-d
    and ``map[i][d] = j  <=>  map[j][K-1-d] = i``, so

        dL/dfeat = conv(dL/dout, same map, flip(W, 0) transposed)

    is another GATHER-conv (exact, no scatter).  dW comes from the re-gathered
    im2col matmul (recompute > stash: HBM residency beats one extra gather).
    """
    feat, weight, neighbor_idx = res
    k = weight.shape[0]
    w_mirror = jnp.flip(weight, axis=0).transpose(0, 2, 1)
    dfeat = _conv_apply(g, neighbor_idx, w_mirror.astype(g.dtype), im2col_max_width)
    n, cin = feat.shape
    cout = g.shape[1]
    if _conv_impl() == "pallas" and _pallas_conv_fits(n, cin, k, cout):
        from .pallas.sparse_conv import fused_subm_conv_dw

        dweight = fused_subm_conv_dw(feat, neighbor_idx, g).astype(weight.dtype)
    else:
        feat_pad = jnp.concatenate([feat, jnp.zeros((1, cin), feat.dtype)], axis=0)
        gathered = jnp.take(feat_pad, neighbor_idx, axis=0)  # [N, K, Cin]
        dweight = jnp.einsum(
            "nkc,nd->kcd", gathered, g, preferred_element_type=jnp.float32
        ).astype(weight.dtype)
    return dfeat.astype(feat.dtype), dweight, None


_subm_conv_sym.defvjp(_subm_conv_sym_fwd, _subm_conv_sym_bwd)


def sparse_conv(
    feat: jnp.ndarray,  # [N, Cin]
    kmap: KernelMap,
    weight: jnp.ndarray,  # [K, Cin, Cout]
    bias: Optional[jnp.ndarray] = None,
    im2col_max_width: int = 2048,
    symmetric: bool = True,
) -> jnp.ndarray:
    """Apply a gather-scatter sparse convolution. Returns [N, Cout].

    Missing neighbors contribute zero (index N hits an appended zero row).
    ``symmetric=True`` (valid for centered-cube kernel maps in canonical
    order — every current caller) routes the backward pass through the
    mirrored-map gather conv instead of XLA's scatter-add transpose.
    """
    if symmetric:
        out = _subm_conv_sym(feat, weight, kmap.neighbor_idx, im2col_max_width)
    else:
        out = _conv_apply(feat, kmap.neighbor_idx, weight, im2col_max_width)
    if bias is not None:
        out = out + bias.astype(feat.dtype)
    return out
