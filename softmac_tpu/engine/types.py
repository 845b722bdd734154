"""Core state pytrees and static scene description.

The reference keeps mutable Taichi fields of shape ``(max_steps, N)``
(``softmac/engine/mpm_simulator.py:53-66``); the TPU-native design instead
threads immutable pytrees through ``lax.scan``. Trajectory storage is replaced
by rematerialization (``jax.checkpoint``), so memory is O(N), not O(T*N).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

# material / model enums (parity with reference mpm_simulator.py:4-13)
MODEL_COROTATED = 0
MODEL_NEOHOOKEAN = 1

MAT_PLASTIC = 0
MAT_ELASTIC = 1
MAT_LIQUID = 2

CONTACT_GRID = 0
CONTACT_PARTICLE = 1
CONTACT_MIXED = 2


@struct.dataclass
class MPMState:
    """Per-particle MLS-MPM state: position, velocity, affine field, deformation.

    Layout is struct-of-arrays with the particle axis LAST — the TPU lane
    dimension — so all per-particle math is elementwise on lane-aligned (N,)
    slices (see ops/m33.py for why (N,3)-style layouts are pathological).
    """
    x: jnp.ndarray  # (3, N)
    v: jnp.ndarray  # (3, N)
    C: jnp.ndarray  # (3, 3, N)
    F: jnp.ndarray  # (3, 3, N)

    @property
    def x_nd(self) -> jnp.ndarray:
        """(N, 3) view for losses / IO."""
        return self.x.T


@struct.dataclass
class BodyState:
    """Rigid primitive states, batched over primitives (B bodies)."""
    pos: jnp.ndarray   # (B, 3) body-frame origin in world
    quat: jnp.ndarray  # (B, 4) wxyz
    v: jnp.ndarray     # (B, 3) linear velocity
    w: jnp.ndarray     # (B, 3) angular velocity

    @staticmethod
    def identity(n: int, dtype=jnp.float32) -> "BodyState":
        quat = jnp.zeros((n, 4), dtype).at[:, 0].set(1.0)
        z = jnp.zeros((n, 3), dtype)
        return BodyState(pos=z, quat=quat, v=z, w=z)


@struct.dataclass
class SDFParams:
    """Precomputed signed-distance tables for one primitive (device arrays).

    Tables are stored flattened / channel-major so device sampling is pure
    1-D lane-aligned gathers."""
    table: jnp.ndarray    # (rx*ry*rz,)
    normals: jnp.ndarray  # (3, rx*ry*rz)
    combined: jnp.ndarray  # (rx*ry*rz, 4): [sdf, nx, ny, nz] row-gather layout
    # full 2x2x2 trilinear neighborhood per base cell, one row per cell:
    # (rx*ry*rz, 32) = 8 corners x [sdf, nx, ny, nz]. Makes an SDF+normal
    # query a SINGLE row gather (per-index gather cost dominates on TPU).
    neighborhood: jnp.ndarray
    lower: jnp.ndarray    # (3,)
    upper: jnp.ndarray    # (3,)
    inv_dx: jnp.ndarray   # scalar
    res: Tuple[int, int, int] = struct.field(pytree_node=False, default=(0, 0, 0))


@struct.dataclass
class MPMParams:
    """Per-particle material parameters + scene-level dynamic params."""
    mu: jnp.ndarray            # (N,)
    lam: jnp.ndarray           # (N,)
    yield_stress: jnp.ndarray  # (N,)
    gravity: jnp.ndarray       # (3,)
    control_idx: jnp.ndarray   # (N,) int32, -1 = uncontrolled
    friction: jnp.ndarray      # (B,) per-primitive friction
    softness: jnp.ndarray      # (B,)


@dataclasses.dataclass(frozen=True)
class MPMConfig:
    """Static (trace-time) simulator configuration."""
    n_particles: int
    n_grid: int = 64
    dim: int = 3
    dt: float = 1e-4
    substeps: int = 20
    material_model: int = MODEL_COROTATED
    ptype: int = MAT_PLASTIC
    collision_type: int = CONTACT_MIXED
    ground_friction: float = 1.5
    n_primitives: int = 0
    n_controllers: int = 0
    plastic_mode: str = "clip"   # "clip" (reference runtime) | "von_mises"
    # Optional static-size active grid window (wx, wy, wz) in cells. The
    # window's corner tracks the particles each substep; all transfer
    # operators work in window space (the TPU analogue of a sparse grid).
    # None = full grid (always exact). A too-small window sets the
    # `window_overflow` flag in the substep aux output.
    active_window: Any = None
    primitives_contact: Tuple[bool, ...] = ()
    enable_external_force: Tuple[bool, ...] = ()
    rigid_velocity_control: bool = False
    mpm_scale: float = 1.0
    # Cap (m/s) on the mixed-contact penetration push-out speed
    # (primitive_base.py:167-170 is uncapped: ``p_v -= (sdf/dt)*n*life``; at
    # dt=1e-3 against a thin fast collider the kick re-penetrates the far
    # side and amplifies every step until ejection — verified on the door
    # scene, particles reach 1e8 within ~150 steps of the first slam).
    # inf = exact reference formula; the cloth path has the same knob
    # (cloth_contact.push_velocity_cap).
    contact_push_velocity_cap: float = np.inf
    # Grid-velocity clamp at this multiple of dx/dt (CFL cells-per-substep);
    # inf = off (reference parity). See mpm.cfl_clamp.
    cfl_velocity_clamp: float = np.inf
    # Chunked-kernel particle-tile width (lanes). 0 = module default
    # (SOFTMAC_TPU_TILE_C env or 1536); envs resolve "auto" per scene via
    # mpm.auto_chunk_tile. Safety contract: a tile whose sorted y-span
    # exceeds the kernels' 16-row window raises the rollout's
    # window_overflow flag.
    chunk_tile: int = 0
    dtype: Any = jnp.float32

    @property
    def dx(self) -> float:
        # domain spans [0, mpm_scale]^3 (soft_cloth mpm_simulator.py:31)
        return self.mpm_scale / self.n_grid

    @property
    def inv_dx(self) -> float:
        return float(self.n_grid) / self.mpm_scale

    @property
    def p_vol(self) -> float:
        # parity with reference: (dx*0.5)**2 even in 3D (mpm_simulator.py:34)
        return (self.dx * 0.5) ** 2

    @property
    def p_mass(self) -> float:
        return self.p_vol * 1.0

    @property
    def n_cells(self) -> int:
        return self.n_grid ** 3


def mpm_state_zero(cfg: MPMConfig, x: jnp.ndarray) -> MPMState:
    """Initial state: particles at x (N, 3), zero velocity, identity F, zero C
    (parity with reset_kernel, mpm_simulator.py:495-501)."""
    n = x.shape[0]
    dtype = cfg.dtype
    eyeN = jnp.zeros((3, 3, n), dtype)
    for d in range(3):
        eyeN = eyeN.at[d, d].set(1.0)
    return MPMState(
        x=x.T.astype(dtype),
        v=jnp.zeros((3, n), dtype),
        C=jnp.zeros((3, 3, n), dtype),
        F=eyeN,
    )


def mpm_state_from_packed(cfg: MPMConfig, packed: jnp.ndarray) -> MPMState:
    """Load an (N, 24) packed state [x(3) v(3) F(9) C(9)] — the reference's
    checkpoint layout (mpm_simulator.py:481-492, 504-512)."""
    n = packed.shape[0]
    dtype = cfg.dtype
    return MPMState(
        x=packed[:, 0:3].T.astype(dtype),
        v=packed[:, 3:6].T.astype(dtype),
        F=packed[:, 6:15].reshape(n, 3, 3).transpose(1, 2, 0).astype(dtype),
        C=packed[:, 15:24].reshape(n, 3, 3).transpose(1, 2, 0).astype(dtype),
    )


def mpm_state_to_packed(state: MPMState) -> jnp.ndarray:
    n = state.x.shape[-1]
    return jnp.concatenate(
        [state.x.T, state.v.T,
         state.F.transpose(2, 0, 1).reshape(n, 9),
         state.C.transpose(2, 0, 1).reshape(n, 9)], axis=1
    )
