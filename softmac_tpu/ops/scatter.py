"""Grid scatter-add backends for P2G.

TPUs have no atomics; the P2G 27-cell scatter is expressed as an XLA
scatter-add (deterministic) with a sort+segment-sum alternative. The choice is
a config knob so the benchmark can pick the fastest backend per platform.
The reference's equivalent is the ``ti.atomic_add`` scatter in
``softmac/engine/mpm_simulator.py:261-262``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_add(cell_ids: jnp.ndarray, values: jnp.ndarray, n_cells: int,
                method: str = "scatter") -> jnp.ndarray:
    """Accumulate values (M, C) into a (n_cells, C) grid at cell_ids (M,)."""
    if method == "scatter":
        out = jnp.zeros((n_cells, values.shape[-1]), values.dtype)
        return out.at[cell_ids].add(values, mode="drop")
    if method == "sort":
        order = jnp.argsort(cell_ids)
        ids_sorted = cell_ids[order]
        vals_sorted = values[order]
        return jax.ops.segment_sum(
            vals_sorted, ids_sorted, num_segments=n_cells,
            indices_are_sorted=True,
        )
    raise ValueError(method)
