"""Grid scatter-add backends for P2G.

TPUs have no atomics; the P2G 27-cell scatter is expressed as per-channel 1-D
XLA scatter-adds (deterministic, lane-aligned — 2-D scatters with a tiny
minor dim would pad 4 -> 128 lanes), with a sort+segment-sum alternative. The
reference's equivalent is the ``ti.atomic_add`` scatter in
``softmac/engine/mpm_simulator.py:261-262``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_add_1d(cell_ids: jnp.ndarray, values: jnp.ndarray, n_cells: int,
                   method: str = "scatter") -> jnp.ndarray:
    """Accumulate values (M,) into a (n_cells,) grid channel at cell_ids (M,)."""
    if method == "scatter":
        return jnp.zeros((n_cells,), values.dtype).at[cell_ids].add(values)
    if method == "sort":
        order = jnp.argsort(cell_ids)
        return jax.ops.segment_sum(
            values[order], cell_ids[order], num_segments=n_cells,
            indices_are_sorted=True)
    raise ValueError(method)


def scatter_add(cell_ids: jnp.ndarray, values: jnp.ndarray, n_cells: int,
                method: str = "scatter") -> jnp.ndarray:
    """Multi-channel variant: values (M, C) -> (n_cells, C)."""
    if method == "scatter":
        out = jnp.zeros((n_cells, values.shape[-1]), values.dtype)
        return out.at[cell_ids].add(values, mode="drop")
    if method == "sort":
        order = jnp.argsort(cell_ids)
        return jax.ops.segment_sum(
            values[order], cell_ids[order], num_segments=n_cells,
            indices_are_sorted=True)
    raise ValueError(method)
