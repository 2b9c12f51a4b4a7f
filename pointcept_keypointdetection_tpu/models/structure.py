"""PointBatch — the static-shape point-cloud batch structure.

The TPU-native re-design of the reference's ``Point`` dict
(`pointcept/models/utils/structure.py:20-207`).  Key differences, driven by
XLA's static-shape compilation model:

* **Fixed per-sample slots.**  A batch is ``B`` samples of exactly ``S``
  (padded) points each, stored flat as ``[B*S]`` arrays.  ``batch`` ids are
  therefore implied by position and validity is an explicit mask — this
  replaces the reference's ragged ``offset`` chaining
  (`structure.py:44-50`, `datasets/utils.py:16-69`).
* **Serialization keeps slots.**  Sort keys are ``batch << 3*depth | code``
  with invalid points forced to the *top of their own slot's key range*, so
  every serialized order is a within-slot permutation.  Serialized-attention
  patches (a multiple of S) then never straddle samples — no varlen
  ``cu_seqlens`` machinery (`point_transformer_v3m1_base.py:114-170`) is
  needed at all.
* **Sparsify -> kernel maps.**  Instead of a spconv COO tensor, sparse convs
  consume a cached sorted-code voxel index (see ``ops/sparse.py``), the
  analogue of spconv's ``indice_key`` reuse.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.codes import Code64, code_lexsort, code_take
from ..ops.serialization import encode

DEFAULT_ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans")


def _fill_invalid_keep_batch(code: Code64, valid: jnp.ndarray, depth: int) -> Code64:
    """Set the spatial bits (low 3*depth) of invalid entries to all-ones,
    keeping the batch prefix, so pads sort to the end of their own slot."""
    shift = 3 * depth
    if shift >= 32:
        lo_mask = jnp.uint32(0xFFFFFFFF)
        hi_mask = jnp.uint32((1 << (shift - 32)) - 1)
    else:
        lo_mask = jnp.uint32((1 << shift) - 1)
        hi_mask = jnp.uint32(0)
    return Code64(
        hi=jnp.where(valid, code.hi, code.hi | hi_mask),
        lo=jnp.where(valid, code.lo, code.lo | lo_mask),
    )


@struct.dataclass
class PointBatch:
    """A batch of point clouds with static shapes.

    All per-point arrays are flat ``[B*S, ...]``; sample ``b`` occupies rows
    ``[b*S, (b+1)*S)`` with its padded (invalid) rows at arbitrary positions
    inside the slot (collation puts them at the end; serialization re-sorts
    within slots keeping them at the end).
    """

    coord: jnp.ndarray  # f32[N, 3] — metric coordinates
    feat: jnp.ndarray  # f32[N, C]
    grid_coord: jnp.ndarray  # i32[N, 3] — voxel coords, >= 0 per sample
    valid: jnp.ndarray  # bool[N]
    num_samples: int = struct.field(pytree_node=False)

    # serialization state (None until .serialize())
    serialized_code: Optional[Code64] = None  # hi/lo each [O, N], input layout
    serialized_order: Optional[jnp.ndarray] = None  # i32[O, N] permutation
    serialized_inverse: Optional[jnp.ndarray] = None  # i32[O, N]
    serialized_depth: int = struct.field(pytree_node=False, default=0)

    # cached lookup structures (kernel maps etc.), keyed by stage name
    context: Dict[str, jnp.ndarray] = struct.field(default_factory=dict)

    @property
    def num_points(self) -> int:
        return self.coord.shape[0]

    @property
    def slot_size(self) -> int:
        return self.coord.shape[0] // self.num_samples

    @property
    def batch(self) -> jnp.ndarray:
        """i32[N] sample index per point (implied by slot layout)."""
        n = self.num_points
        s = self.slot_size
        return (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) // s).reshape(n)

    # -- serialization ---------------------------------------------------
    def serialize(
        self,
        orders=DEFAULT_ORDERS,
        depth: int = 16,
        shuffle_key: Optional[jax.Array] = None,
    ) -> "PointBatch":
        """Compute space-filling-curve orders (parity:
        `structure.py:52-109` + `PointTransformerV3.forward:699-703`).

        ``shuffle_key``: PRNG key to permute the order list (the reference's
        ``shuffle_orders``); None keeps the given order.
        """
        assert 3 * depth + max(self.num_samples.bit_length(), 1) <= 64
        codes = []
        order_perms = []
        inverses = []
        batch = self.batch
        n = self.num_points
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)
        for order_name in orders:
            code = encode(self.grid_coord, batch, depth=depth, order=order_name)
            code = _fill_invalid_keep_batch(code, self.valid, depth)
            perm = code_lexsort(code)
            inv = jnp.zeros((n,), jnp.int32).at[perm].set(iota)
            codes.append(code)
            order_perms.append(perm)
            inverses.append(inv)

        order_arr = jnp.stack(order_perms)
        inverse_arr = jnp.stack(inverses)
        code_arr = Code64(hi=jnp.stack([c.hi for c in codes]), lo=jnp.stack([c.lo for c in codes]))
        if shuffle_key is not None and len(orders) > 1:
            perm = jax.random.permutation(shuffle_key, len(orders))
            order_arr = order_arr[perm]
            inverse_arr = inverse_arr[perm]
            code_arr = Code64(hi=code_arr.hi[perm], lo=code_arr.lo[perm])
        return self.replace(
            serialized_code=code_arr,
            serialized_order=order_arr,
            serialized_inverse=inverse_arr,
            serialized_depth=depth,
        )

    def take(self, idx: jnp.ndarray, **overrides) -> "PointBatch":
        """Gather per-point arrays by row index (serialization state dropped)."""
        return PointBatch(
            coord=jnp.take(self.coord, idx, axis=0),
            feat=overrides.get("feat", jnp.take(self.feat, idx, axis=0)),
            grid_coord=jnp.take(self.grid_coord, idx, axis=0),
            valid=jnp.take(self.valid, idx, axis=0),
            num_samples=self.num_samples,
            context={},
        )
