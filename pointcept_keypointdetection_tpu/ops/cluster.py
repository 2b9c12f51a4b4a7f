"""Connected-component clustering over point neighborhoods.

The TPU replacement for pointgroup_ops' CUDA ``ballquery_batch_p`` +
``bfs_cluster`` (`libs/pointgroup_ops/src/bfs_cluster.cpp`): iterative
min-label propagation over a knn/radius graph — each round every point takes
the minimum cluster label among its in-radius, same-class neighbors; after
``iters`` rounds (or convergence) labels are connected-component ids.
Static shapes; O(k*N) per round on the VPU, diameter-bounded rounds.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .knn import knn


def connected_components(
    coord: jnp.ndarray,  # [N, 3]
    classes: jnp.ndarray,  # int32[N] semantic class per point
    valid: jnp.ndarray,  # bool[N]
    radius: float,
    k: int = 16,
    batch: jnp.ndarray = None,
    ignore_classes: Tuple[int, ...] = (),
    max_iters: int = 64,
) -> jnp.ndarray:
    """Returns int32[N] component labels (min point index per component);
    invalid/ignored points get label -1."""
    n = coord.shape[0]
    idx, sqd = knn(coord, coord, k, query_batch=batch, base_batch=batch, base_valid=valid)
    nbr_class = jnp.take(classes, idx, axis=0)
    connect = (
        (sqd <= radius * radius)
        & (nbr_class == classes[:, None])
        & valid[:, None]
        & jnp.take(valid, idx, axis=0)
    )
    active = valid
    for c in ignore_classes:
        active = active & (classes != c)
    connect = connect & active[:, None]

    init = jnp.where(active, jnp.arange(n, dtype=jnp.int32), n)

    def body(carry):
        labels, _, it = carry
        nbr_labels = jnp.where(connect, jnp.take(labels, idx, axis=0), n)
        new = jnp.minimum(labels, jnp.min(nbr_labels, axis=1))
        # pointer jumping accelerates convergence: label <- label[label]
        new = jnp.where(new < n, jnp.take(new, jnp.minimum(new, n - 1), axis=0), new)
        changed = jnp.any(new != labels) & (it < max_iters)
        return new, changed, it + 1

    labels, _, _ = jax.lax.while_loop(
        lambda c: c[1], body, (init, jnp.asarray(True), jnp.asarray(0))
    )
    return jnp.where(labels < n, labels, -1).astype(jnp.int32)
