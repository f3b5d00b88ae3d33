"""Per-column level selection without TPU gathers.

On TPU an XLA gather costs roughly per-index-vector (6-24 ms for one
fancy-index lookup over a 300x300x20 grid on v5e), which made
``take_along_axis`` level selections the dominant cost of several column
physics schemes. For a SMALL leading axis (z levels, soil/snow layers)
an unrolled where-chain compiles to one fused elementwise pass instead.
"""

from __future__ import annotations

import jax.numpy as jnp


def take_level(arr, idx):
    """``jnp.take_along_axis(arr, idx, axis=0)`` replacement for a small
    axis 0.

    ``arr`` is (n, *spatial); ``idx`` is either (*spatial) — one level
    per column, returning (*spatial) — or (m, *spatial), returning
    (m, *spatial). Exact (each output selects one element) and matches
    take_along_axis's clip semantics for out-of-range indices.
    """
    n = arr.shape[0]
    idx = jnp.clip(idx, 0, n - 1)
    out = jnp.broadcast_to(arr[0], jnp.broadcast_shapes(
        idx.shape, arr.shape[1:])).astype(arr.dtype)
    for lev in range(1, n):
        out = jnp.where(idx == lev, arr[lev], out)
    return out
