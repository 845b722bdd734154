"""Pallas TPU kernels: fused mixed-mode SDF contact (forecast model).

``contact.collide_mixed`` (primitive_base.py:139-181 semantics) is two SDF
queries plus ~60 elementwise vector ops and a friction-cone select chain.
On TPU the two (N, 32)-row table gathers are at their bandwidth/index floor
(~1.2 ms each at 1e5 particles) but the surrounding XLA program costs
another ~2-3 ms per call in layout/pass overhead. These kernels fuse
EVERYTHING between the gathers into two elementwise pallas_calls:

    idx1 = cell(x)            [XLA]     rows1 = table[:, idx1]   [XLA gather]
    kernel A: trilinear (sdf, normal) + friction-cone response -> p_v1, x_new
    idx2 = cell(x_new)        [XLA]     rows2 = table[:, idx2]   [XLA gather]
    kernel B: penetration push-out -> p_v_out, b_f

The gathers use the TRANSPOSED (32, M) table view so rows land directly in
the (32, T) sublane-major block the kernels consume; the transpose of the
constant table is loop-invariant and hoisted out of the substep scan by XLA.

Backward: custom_vjp whose bwd is jax.vjp of the XLA implementation
(``contact._collide_mixed_xla``) — bit-identical cotangents to autodiff of
the production path. prim-table cotangents are returned as zeros (the
tables are constants; the rollout never differentiates them, so XLA DCEs
the zeros).

Reference: softmac/engine/primitive/primitive_base.py:139-181 (collide
mixed), mesh.py:96-118 (trilinear SDF/normal sample).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from softmac_tpu.ops import m33

_TILE_N = 2048
_INTERPRET = False
BIG = 1e10
CONTACT_THRESHOLD = 5e-3

# par row layout (lane index in the (1, 128) parameter block)
_BP, _BQ, _BV, _BW = 0, 3, 7, 10
_FRICTION, _SOFTNESS, _LIFE, _PUSH_CAP = 13, 14, 15, 16
_LOWER, _UPPER, _INV_DX = 17, 20, 23


def _scalars(par):
    def P(i):
        return par[0, i]
    bp = (P(_BP), P(_BP + 1), P(_BP + 2))
    bq = (P(_BQ), P(_BQ + 1), P(_BQ + 2), P(_BQ + 3))
    bv = (P(_BV), P(_BV + 1), P(_BV + 2))
    bw = (P(_BW), P(_BW + 1), P(_BW + 2))
    lower = (P(_LOWER), P(_LOWER + 1), P(_LOWER + 2))
    upper = (P(_UPPER), P(_UPPER + 1), P(_UPPER + 2))
    return bp, bq, bv, bw, lower, upper, P


def _local_and_fx(p_loc, lower, upper, inv_dx, res):
    """in_box + trilinear fractions, mirroring sdf.sample_sdf_normal_local."""
    in_box = ((p_loc[0] >= lower[0]) & (p_loc[0] < upper[0])
              & (p_loc[1] >= lower[1]) & (p_loc[1] < upper[1])
              & (p_loc[2] >= lower[2]) & (p_loc[2] < upper[2]))
    fx = []
    for d in range(3):
        pos = (p_loc[d] - lower[d]) * inv_dx
        b = jnp.clip(jnp.floor(pos), 0.0, float(res[d] - 2))
        fx.append(jnp.clip(pos - b, 0.0, 1.0))
    return in_box, fx


def _combine(rows, fx, in_box):
    """Trilinear (sdf, unit normal) from a (32, T) row block."""
    sdf = 0.0
    nx = ny = nz = 0.0
    c = 0
    for i in (0, 1):
        wi = fx[0] if i else (1.0 - fx[0])
        for j in (0, 1):
            wj = fx[1] if j else (1.0 - fx[1])
            for k in (0, 1):
                wk = fx[2] if k else (1.0 - fx[2])
                w = wi * wj * wk
                sdf = sdf + w * rows[4 * c + 0:4 * c + 1, :]
                nx = nx + w * rows[4 * c + 1:4 * c + 2, :]
                ny = ny + w * rows[4 * c + 2:4 * c + 3, :]
                nz = nz + w * rows[4 * c + 3:4 * c + 4, :]
                c += 1
    norm = jnp.sqrt(nx * nx + ny * ny + nz * nz + 1e-14)
    n = (nx / norm, ny / norm, nz / norm)
    zero = jnp.zeros_like(norm)
    n = m33.vwhere(in_box, n, (zero, jnp.ones_like(norm), zero))
    return jnp.where(in_box, sdf, BIG), n


def _make_mixed1_kernel(res, dt):
    def kernel(rows_ref, xv_ref, par_ref, out_ref):
        par = par_ref[:]
        bp, bq, bv, bw, lower, upper, P = _scalars(par)
        xv = xv_ref[:]
        x = (xv[0:1, :], xv[1:2, :], xv[2:3, :])
        v = (xv[3:4, :], xv[4:5, :], xv[5:6, :])

        qinv = m33.qnorm(m33.qconj(bq))
        p_loc = m33.qrot(qinv, m33.vsub(x, bp))
        in_box, fx = _local_and_fx(p_loc, lower, upper, P(_INV_DX), res)
        dist, n_loc = _combine(rows_ref[:], fx, in_box)
        D = m33.qrot(bq, n_loc)

        mask = dist <= CONTACT_THRESHOLD
        dist_s = jnp.where(mask, dist, 0.0)
        r = m33.vsub(x, bp)
        cv = m33.qrot(m33.qnorm(bq),
                      m33.vadd(bv, m33.cross(bw, m33.qrot(
                          m33.qconj(m33.qnorm(bq)), r))))
        input_v = m33.vsub(v, cv)
        nc = m33.dot(input_v, D)
        p_v_t = m33.vsub(input_v, m33.vscale(D, nc))
        vt_norm = jnp.sqrt(m33.dot(p_v_t, p_v_t) + 1e-8)
        vt_fric = m33.vscale(
            p_v_t, jnp.maximum(0.0, vt_norm + nc * P(_FRICTION)) / vt_norm)
        flag = (nc < 0) & (m33.dot(p_v_t, p_v_t) > 1e-60)
        p_v_t = m33.vwhere(flag, vt_fric, p_v_t)
        v_contact = m33.vadd(cv, p_v_t)
        influence = jnp.exp(-jnp.maximum(dist_s, 0.0) * P(_SOFTNESS))
        v_soft = m33.vadd(cv, m33.vadd(
            m33.vscale(input_v, 1.0 - influence),
            m33.vscale(p_v_t, influence)))
        v_near = m33.vwhere(dist_s > 0, v_soft, v_contact)
        p_v1 = m33.vwhere(mask & (nc < 0), v_near, v)

        for d in range(3):
            out_ref[d:d + 1, :] = p_v1[d]
            out_ref[3 + d:4 + d, :] = x[d] + dt * p_v1[d]
        out_ref[6:7, :] = dist
        out_ref[7:8, :] = jnp.zeros_like(dist)
    return kernel


def _make_mixed2_kernel(res, dt, p_mass):
    def kernel(rows2_ref, xv_ref, st1_ref, par_ref, out_ref):
        par = par_ref[:]
        bp, bq, bv, bw, lower, upper, P = _scalars(par)
        xv = xv_ref[:]
        v = (xv[3:4, :], xv[4:5, :], xv[5:6, :])
        st1 = st1_ref[:]
        p_v1 = (st1[0:1, :], st1[1:2, :], st1[2:3, :])
        x_new = (st1[3:4, :], st1[4:5, :], st1[5:6, :])
        dist1 = st1[6:7, :]

        qinv = m33.qnorm(m33.qconj(bq))
        p_loc = m33.qrot(qinv, m33.vsub(x_new, bp))
        in_box, fx = _local_and_fx(p_loc, lower, upper, P(_INV_DX), res)
        sdf2, n2_loc = _combine(rows2_ref[:], fx, in_box)
        n2 = m33.qrot(bq, n2_loc)

        mask = dist1 <= CONTACT_THRESHOLD
        pen = mask & (sdf2 < 0)
        sdf2_s = jnp.where(pen, sdf2, 0.0)
        push = jnp.minimum(-(sdf2_s / dt) * P(_LIFE), P(_PUSH_CAP))
        p_v2 = m33.vadd(p_v1, m33.vscale(n2, push))
        p_v_out = m33.vwhere(mask, p_v2, v)

        for d in range(3):
            out_ref[d:d + 1, :] = p_v_out[d]
            out_ref[3 + d:4 + d, :] = (v[d] - p_v_out[d]) * (p_mass / dt)
        out_ref[6:8, :] = jnp.zeros_like(out_ref[6:8, :])
    return kernel


def _cell_index(prim, p_loc):
    """Flat base-cell index, identical to sdf.sample_sdf_normal_local."""
    res = prim.res
    base = []
    for d in range(3):
        pos = (p_loc[d] - prim.lower[d]) * prim.inv_dx
        base.append(jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, res[d] - 2))
    return (base[0] * res[1] + base[1]) * res[2] + base[2]


def _pad8(arrs, n, tile):
    n_pad = -(-n // tile) * tile
    if n_pad == n:
        return arrs, n_pad
    return [jnp.pad(a, ((0, 0), (0, n_pad - n))) for a in arrs], n_pad


def _run_kernel(kernel, rows_blocks, dense_blocks, n):
    """rows_blocks: list of (32, N); dense_blocks: list of (8, N) / (1,128)
    par (the last entry, constant across tiles)."""
    tile = _TILE_N
    par = dense_blocks[-1]
    arrs, n_pad = _pad8(list(rows_blocks) + list(dense_blocks[:-1]), n, tile)

    def spec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    in_specs = ([spec(32)] * len(rows_blocks)
                + [spec(8)] * (len(dense_blocks) - 1)
                + [pl.BlockSpec((1, 128), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)])
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=in_specs,
        out_specs=spec(8),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        interpret=_INTERPRET,
    )(*arrs, par)
    return out[:, :n]


def _pack_par(prim, bp, bq, bv, bw, friction, softness, life, push_cap):
    vals = jnp.stack([
        bp[0], bp[1], bp[2], bq[0], bq[1], bq[2], bq[3],
        bv[0], bv[1], bv[2], bw[0], bw[1], bw[2],
        friction, softness, life, push_cap,
        prim.lower[0], prim.lower[1], prim.lower[2],
        prim.upper[0], prim.upper[1], prim.upper[2],
        prim.inv_dx,
    ]).astype(jnp.float32)
    return jnp.pad(vals, (0, 128 - vals.shape[0]))[None, :]


@functools.lru_cache(maxsize=None)
def _fused_factory(res, dt, p_mass, push_cap):
    """custom_vjp collide_mixed for static (res, dt, p_mass, push_cap).
    Forward runs the two fused kernels; backward is jax.vjp of the XLA
    implementation (identical cotangents to autodiff of the production
    path)."""
    k1 = _make_mixed1_kernel(res, dt)
    k2 = _make_mixed2_kernel(res, dt, p_mass)

    def fwd_impl(prim, bp, bq, bv, bw, friction, softness, x, p_v, life):
        n = x[0].shape[0]
        par = _pack_par(prim, bp, bq, bv, bw, friction, softness, life,
                        push_cap)
        nbt = prim.neighborhood.T          # hoisted out of the scan by XLA
        qinv = m33.qnorm(m33.qconj((bq[0], bq[1], bq[2], bq[3])))
        bp3 = (bp[0], bp[1], bp[2])

        xv = jnp.concatenate([jnp.stack(list(x)), jnp.stack(list(p_v)),
                              jnp.zeros((2, n), jnp.float32)], axis=0)
        p_loc = m33.qrot(qinv, m33.vsub(x, bp3))
        rows1 = nbt[:, _cell_index(prim, p_loc)]
        st1 = _run_kernel(k1, [rows1], [xv, par], n)

        x_new = (st1[3], st1[4], st1[5])
        p_loc2 = m33.qrot(qinv, m33.vsub(x_new, bp3))
        rows2 = nbt[:, _cell_index(prim, p_loc2)]
        out = _run_kernel(k2, [rows2], [xv, st1, par], n)

        p_v_out = (out[0], out[1], out[2])
        b_f = (out[3], out[4], out[5])
        mask = st1[6] <= CONTACT_THRESHOLD
        r = m33.vsub(x, bp3)
        b_f = tuple(jnp.where(mask, f, 0.0) for f in b_f)
        b_t = m33.cross(r, b_f)
        wrench = jnp.stack([jnp.sum(c) for c in (b_f + b_t)])
        return p_v_out, wrench

    @jax.custom_vjp
    def fused(prim, bp, bq, bv, bw, friction, softness, x, p_v, life):
        return fwd_impl(prim, bp, bq, bv, bw, friction, softness, x, p_v,
                        life)

    def _fwd(*args):
        return fused(*args), args

    def _bwd(res_args, g):
        from softmac_tpu.engine import contact as cm
        prim = res_args[0]

        def ref(bp, bq, bv, bw, friction, softness, x, p_v, life):
            return cm._collide_mixed_xla(
                prim, bp, bq, bv, bw, friction, softness, x, p_v,
                life, p_mass=p_mass, dt=dt, push_cap=push_cap)

        _, vjp = jax.vjp(ref, *res_args[1:])
        grads = vjp(g)
        zero_prim = jax.tree_util.tree_map(jnp.zeros_like, prim)
        return (zero_prim,) + tuple(grads)

    fused.defvjp(_fwd, _bwd)
    return fused


def kernel_wanted(dtype) -> bool:
    return (_HAS_PALLAS and dtype == jnp.float32
            and not os.environ.get("SOFTMAC_TPU_NO_CONTACT_KERNEL"))


def collide_mixed_fused(prim, body_pos, body_quat, body_v, body_w,
                        friction, softness, x, p_v, life, *, p_mass, dt,
                        push_cap=None):
    """Drop-in fused replacement for contact._collide_mixed_xla (TPU f32).
    p_mass / dt / push_cap are trace-time statics (lru-cached factory)."""
    import numpy as np
    cap = np.inf if push_cap is None else float(push_cap)
    fn = _fused_factory(tuple(prim.res), float(dt), float(p_mass), cap)
    return fn(prim, body_pos, body_quat, body_v, body_w,
              jnp.asarray(friction, jnp.float32),
              jnp.asarray(softness, jnp.float32), x, p_v,
              jnp.asarray(life, jnp.float32))
