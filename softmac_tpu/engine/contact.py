"""Rigid-primitive contact models in struct-of-arrays form.

Three models with reference parity:
- grid contact        (``softmac/engine/primitive/primitive_base.py:72-103``)
- particle penalty    (``primitive_base.py:105-137``)
- mixed / forecast    (``primitive_base.py:139-181``)

Each returns corrected velocities plus the 6-DoF wrench on the body (force,
torque about the body origin). The reference accumulates the wrench with
atomics; here it is a masked sum, which XLA executes deterministically.

All particle/grid quantities are vec tuples of (N,) arrays; body state is
tiny per-body arrays whose components broadcast as scalars.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from softmac_tpu.engine.sdf import sample_sdf_normal_world
from softmac_tpu.engine.types import SDFParams
from softmac_tpu.ops import m33

CONTACT_THRESHOLD = 5e-3


def _length(v, eps=1e-8):
    return jnp.sqrt(m33.dot(v, v) + eps)


def _body_tuples(body_pos, body_quat, body_v, body_w):
    p = (body_pos[0], body_pos[1], body_pos[2])
    q = (body_quat[0], body_quat[1], body_quat[2], body_quat[3])
    v = (body_v[0], body_v[1], body_v[2])
    w = (body_w[0], body_w[1], body_w[2])
    return p, q, v, w


def collider_velocity(bq, bv, bw, r):
    """Velocity of the body surface point at world offset r from the origin
    (primitive_base.py:63-70: v and w live in the body frame)."""
    qn = m33.qnorm(bq)
    r_local = m33.qrot(m33.qconj(qn), r)
    v_local = m33.vadd(bv, m33.cross(bw, r_local))
    return m33.qrot(qn, v_local)


def _wrench(b_f, r, mask):
    b_f = tuple(jnp.where(mask, f, 0.0) for f in b_f)
    b_t = m33.cross(r, b_f)
    return jnp.stack([jnp.sum(c) for c in (b_f + b_t)])


def collide_grid(prim: SDFParams, body_pos, body_quat, body_v, body_w,
                 friction, softness, grid_pos, v_out, dt, grid_m):
    """Grid-level contact (CONTACT_GRID). grid_pos/v_out: vec of (G,)."""
    bp, bq, bv, bw = _body_tuples(body_pos, body_quat, body_v, body_w)
    dist, D = sample_sdf_normal_world(prim, bp, bq, grid_pos)
    # min(exp(-d*s), 1) written AD-safely: for d < 0 the raw exp overflows to
    # inf and min's VJP then emits 0*inf = NaN; clamping the exponent gives the
    # identical value (exp(0) = 1) with a finite backward.
    influence = jnp.exp(-jnp.maximum(dist, 0.0) * softness)
    mask = ((softness > 0) & (influence > 0.1)) | (dist <= 0.0)

    v_in = v_out
    r = m33.vsub(grid_pos, bp)
    cv = collider_velocity(bq, bv, bw, r)

    input_v = m33.vsub(v_out, cv)
    nc = m33.dot(input_v, D)

    v_t = m33.vsub(input_v, m33.vscale(D, jnp.minimum(nc, 0.0)))
    vt_norm = _length(v_t)
    v_t_fric = m33.vscale(v_t, jnp.maximum(0.0, vt_norm + nc * friction) / vt_norm)
    flag = (nc < 0) & (m33.dot(v_t, v_t) > 1e-60)
    v_t = m33.vwhere(flag, v_t_fric, v_t)

    v_new = m33.vadd(cv, m33.vadd(m33.vscale(input_v, 1.0 - influence),
                                  m33.vscale(v_t, influence)))
    v_out = m33.vwhere(mask, v_new, v_in)

    b_f = m33.vscale(m33.vsub(v_in, v_out), grid_m / dt)
    return v_out, _wrench(b_f, r, mask)


def collide_particle(prim: SDFParams, body_pos, body_quat, body_v, body_w,
                     friction, x, p_v, dt, p_mass):
    """Penalty particle contact (CONTACT_PARTICLE). Returns (impulse, wrench).

    Stability note: the reference's friction force ``|nc| * kf``
    (primitive_base.py:120-126) is an unbounded impulse; at MPM particle mass
    (~6e-5) it can exceed the particle's tangential momentum by orders of
    magnitude, reversing and amplifying sliding every substep until blow-up.
    Here the friction impulse is Coulomb-clamped so it can stop relative
    sliding but never reverse it — identical semantics in the non-overshooting
    regime, unconditionally stable outside it.

    On TPU (f32) everything after the table gather runs in one fused Pallas
    kernel (ops/pallas_contact.py), same architecture as collide_mixed.
    """
    from softmac_tpu.ops import pallas_contact as pc
    if pc.kernel_wanted(x[0].dtype):
        import functools
        from jax import lax
        fused = functools.partial(pc.collide_particle_fused,
                                  p_mass=p_mass, dt=dt)
        xla = functools.partial(_collide_particle_xla, p_mass=p_mass, dt=dt)
        return lax.platform_dependent(
            prim, body_pos, body_quat, body_v, body_w, friction, x, p_v,
            tpu=fused, default=xla)
    return _collide_particle_xla(prim, body_pos, body_quat, body_v, body_w,
                                 friction, x, p_v, p_mass=p_mass, dt=dt)


def _collide_particle_xla(prim: SDFParams, body_pos, body_quat, body_v,
                          body_w, friction, x, p_v, *, p_mass, dt):
    bp, bq, bv, bw = _body_tuples(body_pos, body_quat, body_v, body_w)
    dist, D = sample_sdf_normal_world(prim, bp, bq, x)
    c = dist - CONTACT_THRESHOLD
    mask = c < 0.0
    c = jnp.where(mask, c, 0.0)  # sanitize for AD through the dead branch

    r = m33.vsub(x, bp)
    cv = collider_velocity(bq, bv, bw, r)

    input_v = m33.vsub(p_v, cv)
    nc = m33.dot(input_v, D)
    p_v_t = m33.vsub(input_v, m33.vscale(D, nc))

    k1 = 50.0
    imp1 = m33.vscale(D, -(c * k1 * dt))

    vt_norm = _length(p_v_t)
    fric_mag = jnp.minimum(jnp.abs(nc) * friction * dt, p_mass * vt_norm)
    imp2 = m33.vscale(p_v_t, -fric_mag / vt_norm)

    imp = m33.vadd(imp1, imp2)
    imp = tuple(jnp.where(mask, i, 0.0) for i in imp)
    b_f = m33.vscale(imp, -1.0 / dt)
    return imp, _wrench(b_f, r, mask)


def collide_mixed(prim: SDFParams, body_pos, body_quat, body_v, body_w,
                  friction, softness, x, p_v, p_mass, dt, life,
                  push_cap=None):
    """Forecast-based mixed contact (primitive_base.py:139-181).

    x, p_v: vec of (N,); life: scalar 1/(substeps - k). Returns (p_v', wrench).
    ``push_cap`` bounds the penetration push-out speed (m/s); None/inf is the
    reference's uncapped ``(sdf/dt)*life`` (primitive_base.py:167-170).

    On TPU (f32) the whole pipeline between the two SDF row gathers runs in
    fused Pallas kernels (ops/pallas_contact.py); ``lax.platform_dependent``
    keeps the XLA implementation below for every other lowering target.
    """
    from softmac_tpu.ops import pallas_contact as pc
    if pc.kernel_wanted(x[0].dtype):
        import functools
        from jax import lax
        fused = functools.partial(pc.collide_mixed_fused, p_mass=p_mass,
                                  dt=dt, push_cap=push_cap)
        xla = functools.partial(_collide_mixed_xla, p_mass=p_mass, dt=dt,
                                push_cap=push_cap)
        return lax.platform_dependent(
            prim, body_pos, body_quat, body_v, body_w, friction, softness,
            x, p_v, life, tpu=fused, default=xla)
    return _collide_mixed_xla(prim, body_pos, body_quat, body_v, body_w,
                              friction, softness, x, p_v, life,
                              p_mass=p_mass, dt=dt, push_cap=push_cap)


def _collide_mixed_xla(prim: SDFParams, body_pos, body_quat, body_v, body_w,
                       friction, softness, x, p_v, life, *, p_mass, dt,
                       push_cap=None):
    from softmac_tpu.engine import sdf as sdf_mod

    bp, bq, bv, bw = _body_tuples(body_pos, body_quat, body_v, body_w)
    qinv = m33.qnorm(m33.qconj(bq))
    p_loc = m33.qrot(qinv, m33.vsub(x, bp))
    rows, base, fx0 = sdf_mod.gather_rows(prim, p_loc)
    dist, D_loc = sdf_mod.interp_rows(rows, fx0, sdf_mod._in_box(prim, p_loc))
    D = m33.qrot(bq, D_loc)
    mask = dist <= CONTACT_THRESHOLD
    dist_s = jnp.where(mask, dist, 0.0)

    p_v_in = p_v
    r = m33.vsub(x, bp)
    cv = collider_velocity(bq, bv, bw, r)

    input_v = m33.vsub(p_v, cv)
    nc = m33.dot(input_v, D)

    # friction-cone tangential response (only when approaching: nc < 0)
    p_v_t = m33.vsub(input_v, m33.vscale(D, nc))
    vt_norm = _length(p_v_t)
    vt_fric = m33.vscale(p_v_t, jnp.maximum(0.0, vt_norm + nc * friction) / vt_norm)
    flag = (nc < 0) & (m33.dot(p_v_t, p_v_t) > 1e-60)
    p_v_t = m33.vwhere(flag, vt_fric, p_v_t)

    v_contact = m33.vadd(cv, p_v_t)
    # AD-safe min(exp(-d*s), 1): see collide_grid
    influence = jnp.exp(-jnp.maximum(dist_s, 0.0) * softness)
    v_soft = m33.vadd(cv, m33.vadd(m33.vscale(input_v, 1.0 - influence),
                                   m33.vscale(p_v_t, influence)))
    v_near = m33.vwhere(dist_s > 0, v_soft, v_contact)
    p_v1 = m33.vwhere(mask & (nc < 0), v_near, p_v)

    # move penetrated particles toward the surface over the remaining
    # window; the forecast sample reuses the FIRST gather's stencil rows
    # (sdf.forecast_fx) — the second table gather, not the math, is the
    # cost floor of contact on TPU
    x_new = m33.vadd(m33.vscale(p_v1, dt), x)
    p_loc2 = m33.qrot(qinv, m33.vsub(x_new, bp))
    sdf2, n2_loc = sdf_mod.interp_rows(
        rows, sdf_mod.forecast_fx(prim, base, p_loc2),
        sdf_mod._in_box(prim, p_loc2))
    n2 = m33.qrot(bq, n2_loc)
    pen = mask & (sdf2 < 0)
    sdf2_s = jnp.where(pen, sdf2, 0.0)
    push = -(sdf2_s / dt) * life  # >= 0: outward along n2
    if push_cap is not None and np.isfinite(push_cap):
        push = jnp.minimum(push, push_cap)
    p_v2 = m33.vadd(p_v1, m33.vscale(n2, push))

    p_v_out = m33.vwhere(mask, p_v2, p_v_in)
    b_f = m33.vscale(m33.vsub(p_v_in, p_v_out), p_mass / dt)
    return p_v_out, _wrench(b_f, r, mask)
