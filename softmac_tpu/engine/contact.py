"""Rigid-primitive contact models, vectorized over particles / grid cells.

Three models with reference parity:
- grid contact        (``softmac/engine/primitive/primitive_base.py:72-103``)
- particle penalty    (``primitive_base.py:105-137``)
- mixed / forecast    (``primitive_base.py:139-181``)

Each returns the corrected velocities plus the 6-DoF wrench on the body
(force, torque about the body origin). The reference accumulates the wrench
with atomics; here it is a masked sum, which XLA executes deterministically.
"""
from __future__ import annotations

import jax.numpy as jnp

from softmac_tpu.engine.quat import qconj, qnormalize, qrot
from softmac_tpu.engine.sdf import sample_normal_world, sample_sdf_world
from softmac_tpu.engine.types import SDFParams

CONTACT_THRESHOLD = 5e-3


def _length(x, eps=1e-8):
    return jnp.sqrt(jnp.sum(x * x, axis=-1) + eps)


def collider_velocity(body_pos, body_quat, body_v, body_w, r):
    """Velocity of the body surface point at world offset r from the origin
    (primitive_base.py:63-70: v and w live in the body frame)."""
    quat = qnormalize(body_quat)
    r_local = qrot(qconj(quat), r)
    v_local = body_v + jnp.cross(jnp.broadcast_to(body_w, r_local.shape), r_local)
    return qrot(jnp.broadcast_to(quat, r.shape[:-1] + (4,)), v_local)


def _wrench(b_f, r, mask):
    b_f = jnp.where(mask[..., None], b_f, 0.0)
    b_t = jnp.cross(r, b_f)
    return jnp.concatenate([jnp.sum(b_f, axis=0), jnp.sum(b_t, axis=0)])


def collide_grid(prim: SDFParams, body_pos, body_quat, body_v, body_w,
                 friction, softness, grid_pos, v_out, dt, grid_m):
    """Grid-level contact (CONTACT_GRID). grid_pos (G,3), v_out (G,3)."""
    dist = sample_sdf_world(prim, body_pos, body_quat, grid_pos)
    influence = jnp.minimum(jnp.exp(-dist * softness), 1.0)
    mask = ((softness > 0) & (influence > 0.1)) | (dist <= 0.0)

    v_in = v_out
    D = sample_normal_world(prim, body_pos, body_quat, grid_pos)
    r = grid_pos - body_pos
    cv = collider_velocity(body_pos, body_quat, body_v, body_w, r)

    input_v = v_out - cv
    nc = jnp.sum(input_v * D, axis=-1)

    grid_v_t = input_v - jnp.minimum(nc, 0.0)[..., None] * D
    vt_norm = _length(grid_v_t)
    vt_fric = grid_v_t / vt_norm[..., None] * jnp.maximum(0.0, vt_norm + nc * friction)[..., None]
    flag = (nc < 0) & (jnp.sum(grid_v_t * grid_v_t, axis=-1) > 1e-60)
    grid_v_t = jnp.where(flag[..., None], vt_fric, grid_v_t)

    v_new = cv + input_v * (1.0 - influence)[..., None] + grid_v_t * influence[..., None]
    v_out = jnp.where(mask[..., None], v_new, v_in)

    b_f = (grid_m[..., None] * (v_in - v_out)) / dt
    return v_out, _wrench(b_f, r, mask)


def collide_particle(prim: SDFParams, body_pos, body_quat, body_v, body_w,
                     friction, x, p_v, dt):
    """Penalty particle contact (CONTACT_PARTICLE). Returns (impulse, wrench)."""
    dist = sample_sdf_world(prim, body_pos, body_quat, x)
    c = dist - CONTACT_THRESHOLD
    mask = c < 0.0
    c = jnp.where(mask, c, 0.0)  # sanitize for AD through the dead branch

    D = sample_normal_world(prim, body_pos, body_quat, x)
    r = x - body_pos
    cv = collider_velocity(body_pos, body_quat, body_v, body_w, r)

    input_v = p_v - cv
    nc = jnp.sum(input_v * D, axis=-1)
    p_v_t = input_v - nc[..., None] * D

    k1 = 50.0
    f1 = -D * c[..., None] * k1

    vt_norm = _length(p_v_t)
    f2 = -p_v_t / vt_norm[..., None] * (jnp.abs(nc) * friction)[..., None]

    p_f = jnp.where(mask[..., None], f1 + f2, 0.0)
    return p_f * dt, _wrench(-p_f, r, mask)  # b_f = -(f1+f2)


def collide_mixed(prim: SDFParams, body_pos, body_quat, body_v, body_w,
                  friction, softness, x, p_v, p_mass, dt, life):
    """Forecast-based mixed contact (primitive_base.py:139-181).

    x, p_v: (N,3); life: scalar 1/(substeps - k). Returns (p_v_out, wrench).
    """
    dist = sample_sdf_world(prim, body_pos, body_quat, x)
    mask = dist <= CONTACT_THRESHOLD
    dist_s = jnp.where(mask, dist, 0.0)

    p_v_in = p_v
    D = sample_normal_world(prim, body_pos, body_quat, x)
    r = x - body_pos
    cv = collider_velocity(body_pos, body_quat, body_v, body_w, r)

    input_v = p_v - cv
    nc = jnp.sum(input_v * D, axis=-1)

    # friction-cone tangential response (only when approaching: nc < 0)
    p_v_t = input_v - nc[..., None] * D
    vt_norm = _length(p_v_t)
    vt_fric = p_v_t / vt_norm[..., None] * jnp.maximum(0.0, vt_norm + nc * friction)[..., None]
    flag = (nc < 0) & (jnp.sum(p_v_t * p_v_t, axis=-1) > 1e-60)
    p_v_t = jnp.where(flag[..., None], vt_fric, p_v_t)

    v_contact = cv + p_v_t
    influence = jnp.minimum(jnp.exp(-dist_s * softness), 1.0)
    v_soft = cv + input_v * (1.0 - influence)[..., None] + p_v_t * influence[..., None]
    v_near = jnp.where((dist_s > 0)[..., None], v_soft, v_contact)
    p_v1 = jnp.where((mask & (nc < 0))[..., None], v_near, p_v)

    # move penetrated particles toward the surface over the remaining window
    x_new = p_v1 * dt + x
    sdf2 = sample_sdf_world(prim, body_pos, body_quat, x_new)
    pen = mask & (sdf2 < 0)
    sdf2_s = jnp.where(pen, sdf2, 0.0)
    n2 = sample_normal_world(prim, body_pos, body_quat, x_new)
    p_v2 = p_v1 - (sdf2_s / dt)[..., None] * n2 * life

    p_v_out = jnp.where(mask[..., None], p_v2, p_v_in)
    b_f = p_mass * (p_v_in - p_v_out) / dt
    return p_v_out, _wrench(b_f, r, mask)
