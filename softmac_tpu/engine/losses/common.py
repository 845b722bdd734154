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


def chamfer(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Bidirectional sum-of-squared-closest-distance chamfer.

    Matches the reference's frozen-argmin scheme (loss_pour.py:48-68): the
    gradient of min flows only through the argmin element, which is exactly
    what re-running the distance at the frozen index yields.
    """
    d2 = pairwise_sqdist(a, b)
    d2 = jnp.maximum(d2, 0.0)  # guard tiny negative from cancellation
    return jnp.sum(jnp.min(d2, axis=1)) + jnp.sum(jnp.min(d2, axis=0))


def load_target(path: str, search_dirs) -> np.ndarray:
    for d in [".", *search_dirs]:
        cand = os.path.join(d, path)
        if os.path.exists(cand):
            return np.load(cand)
    raise FileNotFoundError(path)
