"""Shared loss building blocks (pure jnp)."""
from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from softmac_tpu.engine.types import BodyState


@struct.dataclass
class FrameSample:
    """What a loss sees at one sampled frame of the rollout."""
    x: jnp.ndarray                   # (N, 3) particle positions
    bodies: Optional[BodyState]      # rigid primitive states (or None)
    cloth_x: Optional[jnp.ndarray] = None  # (V, 3) cloth vertices
    cloth_v: Optional[jnp.ndarray] = None  # (V, 3) cloth vertex velocities


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N,3) x (M,3) -> (N,M) squared distances via a matmul (MXU-friendly)."""
    a2 = jnp.sum(a * a, axis=-1)
    b2 = jnp.sum(b * b, axis=-1)
    return a2[:, None] + b2[None, :] - 2.0 * (a @ b.T)


import jax


@jax.custom_vjp
def chamfer(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Bidirectional sum-of-squared-closest-distance chamfer.

    Matches the reference's frozen-argmin scheme (loss_pour.py:48-68): the
    gradient flows only through the argmin pairings. The custom VJP stores
    ONLY the argmin indices, not the (N, M) distance matrix — without it,
    autodiff keeps the full matrix as a residual per sampled frame (tens of
    GB at 1e4 particles)."""
    d2 = jnp.maximum(pairwise_sqdist(a, b), 0.0)
    return jnp.sum(jnp.min(d2, axis=1)) + jnp.sum(jnp.min(d2, axis=0))


def _chamfer_fwd(a, b):
    d2 = jnp.maximum(pairwise_sqdist(a, b), 0.0)
    ic = jnp.argmin(d2, axis=1)   # closest target for each point
    it = jnp.argmin(d2, axis=0)   # closest point for each target
    loss = jnp.sum(jnp.min(d2, axis=1)) + jnp.sum(jnp.min(d2, axis=0))
    return loss, (a, b, ic, it)


def _chamfer_bwd(res, g):
    a, b, ic, it = res
    # d/da sum_i |a_i - b_{ic_i}|^2 = 2 (a_i - b_{ic_i})
    da = 2.0 * (a - b[ic])
    # d/da sum_j |a_{it_j} - b_j|^2: scatter per-target contributions
    da = da.at[it].add(2.0 * (a[it] - b))
    db = 2.0 * (b - a[it])
    db = db.at[ic].add(2.0 * (b[ic] - a))
    return (g * da, g * db)


chamfer.defvjp(_chamfer_fwd, _chamfer_bwd)


def load_target(path: str, search_dirs) -> np.ndarray:
    for d in [".", *search_dirs]:
        cand = os.path.join(d, path)
        if os.path.exists(cand):
            return np.load(cand)
    raise FileNotFoundError(path)
