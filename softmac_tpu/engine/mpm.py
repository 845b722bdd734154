"""MLS-MPM core: one fused, differentiable substep.

Reference semantics: ``softmac/engine/mpm_simulator.py`` — compute_F_tmp(:126),
p2g(:199), grid_op(:284), boundary_condition(:269), g2p(:300), and the
forecast-based mixed-contact pipeline grid_op_mixed1..4(:396-443). Here the
whole substep is a single pure function ``substep(state, bodies, ...)``
intended to run inside a jitted ``lax.scan``; the hand-written per-kernel
adjoints of the reference (substep_grad, backward_svd, the 4-way kernel split
"for a 10x backward speedup") are all subsumed by ``jax.grad`` + remat.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax.numpy as jnp

from softmac_tpu.engine import contact as contact_mod
from softmac_tpu.engine.materials import compute_stress_and_F, needs_svd
from softmac_tpu.engine.svd3 import svd3
from softmac_tpu.engine.types import (
    CONTACT_GRID,
    CONTACT_MIXED,
    CONTACT_PARTICLE,
    BodyState,
    MPMConfig,
    MPMParams,
    MPMState,
    SDFParams,
)
from softmac_tpu.ops.scatter import scatter_add

# 27 static stencil offsets (quadratic B-spline support)
OFFSETS = tuple((i, j, k) for i in range(3) for j in range(3) for k in range(3))


def _det3(m):
    return (
        m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1])
        - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 0])
        + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0])
    )


def bspline(x: jnp.ndarray, inv_dx: float):
    """Quadratic B-spline stencil: base cell, fractional offset, weights.

    Returns base (N,3) int32, fx (N,3), w (3,N,3) with w[o] the per-axis
    weight of stencil offset o.
    """
    pos = x * inv_dx
    base = jnp.floor(pos - 0.5).astype(jnp.int32)
    fx = pos - base.astype(x.dtype)
    w = jnp.stack(
        [0.5 * (1.5 - fx) ** 2, 0.75 - (fx - 1.0) ** 2, 0.5 * (fx - 0.5) ** 2]
    )
    return base, fx, w


def _cell_ids(cfg: MPMConfig, base: jnp.ndarray, offset) -> jnp.ndarray:
    """Flat grid index of base+offset, clipped into the grid."""
    n = cfg.n_grid
    bx = jnp.clip(base[:, 0] + offset[0], 0, n - 1)
    by = jnp.clip(base[:, 1] + offset[1], 0, n - 1)
    bz = jnp.clip(base[:, 2] + offset[2], 0, n - 1)
    return (bx * n + by) * n + bz


def p2g(cfg: MPMConfig, state: MPMState, F_new: jnp.ndarray, stress: jnp.ndarray,
        impulse: jnp.ndarray, scatter_method: str = "scatter") -> jnp.ndarray:
    """Particle-to-grid transfer. Returns flat grid (G, 4): [mass, momentum]."""
    dtype = state.x.dtype
    base, fx, w = bspline(state.x, cfg.inv_dx)

    stress_coef = -cfg.dt * cfg.p_vol * 4.0 * cfg.inv_dx * cfg.inv_dx
    affine = stress_coef * stress + cfg.p_mass * state.C
    mom = cfg.p_mass * state.v + impulse  # (N,3)

    n = state.x.shape[0]
    ids_list, vals_list = [], []
    for off in OFFSETS:
        weight = w[off[0], :, 0] * w[off[1], :, 1] * w[off[2], :, 2]  # (N,)
        dpos = (jnp.asarray(off, dtype) - fx) * cfg.dx
        val = jnp.empty((n, 4), dtype)
        contrib = mom + jnp.einsum("nij,nj->ni", affine, dpos)
        val = val.at[:, 0].set(weight * cfg.p_mass)
        val = val.at[:, 1:].set(weight[:, None] * contrib)
        ids_list.append(_cell_ids(cfg, base, off))
        vals_list.append(val)

    ids = jnp.concatenate(ids_list)
    vals = jnp.concatenate(vals_list)
    return scatter_add(ids, vals, cfg.n_cells, method=scatter_method)


def grid_coords(cfg: MPMConfig) -> jnp.ndarray:
    """(G, 3) int32 cell coordinates of the flattened grid."""
    n = cfg.n_grid
    idx = jnp.arange(n * n * n, dtype=jnp.int32)
    return jnp.stack([idx // (n * n), (idx // n) % n, idx % n], axis=-1)


def boundary_condition(cfg: MPMConfig, coords: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Box boundary + sticky ground (mpm_simulator.py:269-281)."""
    bound = 3
    n = cfg.n_grid
    low = coords < bound          # (G,3) bool
    high = coords > n - bound
    v = jnp.where(low & (v < 0), 0.0, v)
    v = jnp.where(high & (v > 0), 0.0, v)
    if cfg.ground_friction >= 10.0:
        v = jnp.where(low[:, 1:2], 0.0, v)
    return v


def grid_normalize(cfg: MPMConfig, grid: jnp.ndarray, gravity: jnp.ndarray):
    """Momentum -> velocity + gravity on non-empty cells. Returns (v, mask)."""
    m = grid[:, 0]
    mask = m > 1e-10
    m_safe = jnp.where(mask, m, 1.0)
    v = grid[:, 1:] / m_safe[:, None] + cfg.dt * gravity
    v = jnp.where(mask[:, None], v, 0.0)
    return v, mask, m


def g2p(cfg: MPMConfig, grid_v: jnp.ndarray, x: jnp.ndarray):
    """Grid-to-particle gather + advection. Returns (v_new, C_new, x_new)."""
    dtype = x.dtype
    base, fx, w = bspline(x, cfg.inv_dx)

    new_v = jnp.zeros_like(x)
    new_C = jnp.zeros(x.shape[:-1] + (3, 3), dtype)
    for off in OFFSETS:
        weight = w[off[0], :, 0] * w[off[1], :, 1] * w[off[2], :, 2]
        dpos = jnp.asarray(off, dtype) - fx  # unscaled, matches g2p(:308)
        g_v = grid_v[_cell_ids(cfg, base, off)]
        new_v = new_v + weight[:, None] * g_v
        new_C = new_C + (4.0 * cfg.inv_dx) * weight[:, None, None] * (
            g_v[:, :, None] * dpos[:, None, :]
        )

    x_new = x + cfg.dt * new_v
    return new_v, new_C, x_new


def gather_particles(cfg: MPMConfig, grid_v: jnp.ndarray, x: jnp.ndarray):
    """Weighted gather only (grid_op_mixed2): particle-interpolated velocity."""
    base, fx, w = bspline(x, cfg.inv_dx)
    out = jnp.zeros_like(x)
    for off in OFFSETS:
        weight = w[off[0], :, 0] * w[off[1], :, 1] * w[off[2], :, 2]
        out = out + weight[:, None] * grid_v[_cell_ids(cfg, base, off)]
    return out


def substep(
    cfg: MPMConfig,
    params: MPMParams,
    prims: Tuple[SDFParams, ...],
    state: MPMState,
    bodies: BodyState,
    k,                      # substep index within the env step (0..substeps-1)
    mpm_action=None,        # (n_controllers, 3) or None
    scatter_method: str = "scatter",
) -> Tuple[MPMState, jnp.ndarray]:
    """One MLS-MPM substep with contact. Returns (new_state, ext_f (B, 6))."""
    dtype = state.x.dtype
    n_prims = len(prims)
    eye = jnp.eye(3, dtype=dtype)

    # --- deformation update + stress --------------------------------------
    F_tmp = (eye + cfg.dt * state.C) @ state.F
    if needs_svd(cfg):
        U, sig, V = svd3(F_tmp)
    else:
        U = sig = V = None
    stress, F_new = compute_stress_and_F(
        cfg, F_tmp, U, sig, V, params.mu, params.lam, params.yield_stress)

    # --- impulses: particle contact + particle controllers ----------------
    impulse = jnp.zeros_like(state.v)
    ext_f = jnp.zeros((max(n_prims, 1), 6), dtype)
    if cfg.collision_type == CONTACT_PARTICLE:
        for i in range(n_prims):
            if not cfg.primitives_contact[i]:
                continue
            imp, wrench = contact_mod.collide_particle(
                prims[i], bodies.pos[i], bodies.quat[i], bodies.v[i], bodies.w[i],
                params.friction[i], state.x, state.v, cfg.dt)
            impulse = impulse + imp
            ext_f = ext_f.at[i].add(wrench)

    if cfg.n_controllers > 0 and mpm_action is not None:
        cidx = params.control_idx
        act = mpm_action[jnp.clip(cidx, 0, cfg.n_controllers - 1)]
        impulse = impulse + jnp.where(
            (cidx >= 0)[:, None], 6e-4 * act * cfg.dt, 0.0)

    # --- P2G ---------------------------------------------------------------
    grid = p2g(cfg, state, F_new, stress, impulse, scatter_method)

    # --- grid ops + contact --------------------------------------------------
    coords = grid_coords(cfg)
    g_v, mask, grid_m = grid_normalize(cfg, grid, params.gravity)

    if cfg.collision_type == CONTACT_MIXED:
        grid_v_mixed = boundary_condition(cfg, coords, g_v)
        v_tmp = gather_particles(cfg, grid_v_mixed, state.x)
        v_tgt = v_tmp
        life = 1.0 / (cfg.substeps - k)
        for i in range(n_prims):
            if not cfg.primitives_contact[i]:
                continue
            v_tgt, wrench = contact_mod.collide_mixed(
                prims[i], bodies.pos[i], bodies.quat[i], bodies.v[i], bodies.w[i],
                params.friction[i], params.softness[i],
                state.x, v_tgt, cfg.p_mass, cfg.dt, life)
            ext_f = ext_f.at[i].add(wrench)

        # scatter the velocity correction back (grid_op_mixed4, alpha = 2.0)
        alpha = 2.0
        base, fx, w = bspline(state.x, cfg.inv_dx)
        dv = v_tmp - v_tgt
        ids_list, vals_list = [], []
        for off in OFFSETS:
            weight = w[off[0], :, 0] * w[off[1], :, 1] * w[off[2], :, 2]
            ids_list.append(_cell_ids(cfg, base, off))
            vals_list.append(-alpha * weight[:, None] * dv)
        corr = scatter_add(jnp.concatenate(ids_list), jnp.concatenate(vals_list),
                           cfg.n_cells, method=scatter_method)
        grid_v_out = jnp.where(mask[:, None], grid_v_mixed + corr, 0.0)
    elif cfg.collision_type == CONTACT_GRID:
        grid_pos = coords.astype(dtype) * cfg.dx
        v_out = g_v  # contact first, boundary after (grid_op :290-296)
        for i in range(n_prims):
            if not cfg.primitives_contact[i]:
                continue
            v_new, wrench = contact_mod.collide_grid(
                prims[i], bodies.pos[i], bodies.quat[i], bodies.v[i], bodies.w[i],
                params.friction[i], params.softness[i],
                grid_pos, v_out, cfg.dt, grid_m)
            # contact only touches non-empty cells
            v_out = jnp.where(mask[:, None], v_new, v_out)
            ext_f = ext_f.at[i].add(wrench)
        # reference applies bc after contact in grid mode (grid_op :296)
        grid_v_out = boundary_condition(cfg, coords, v_out)
        grid_v_out = jnp.where(mask[:, None], grid_v_out, 0.0)
    else:
        grid_v_out = boundary_condition(cfg, coords, g_v)

    # --- G2P + advection -----------------------------------------------------
    v_new, C_new, x_new = g2p(cfg, grid_v_out, state.x)
    new_state = MPMState(x=x_new, v=v_new, C=C_new, F=F_new)
    return new_state, ext_f
