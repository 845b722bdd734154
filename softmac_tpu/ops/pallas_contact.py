"""Pallas TPU kernels: fused mixed-mode SDF contact (forecast model).

``contact.collide_mixed`` (primitive_base.py:139-181 semantics) is two SDF
queries plus ~60 elementwise vector ops and a friction-cone select chain.
On TPU a (N, 32)-row table gather is at its per-index floor (~1 ms at 1e5
particles) and the surrounding XLA program costs another ~2-3 ms per call
in layout/pass overhead. These kernels fuse EVERYTHING after the single
gather into two elementwise pallas_calls:

    idx1 = cell(x)            [XLA]     rows1 = table[:, idx1]   [XLA gather]
    kernel: trilinear (sdf, normal) + friction-cone response (stage 1),
            then forecast sample from the SAME rows (fractions relative to
            base(x), sdf.forecast_fx semantics) + penetration push-out
            (stage 2) — composed in ONE launch -> p_v_out, b_f, dist
    tail [XLA]: mask b_f, torque cross, wrench reduction

The composition (default; _fused12_factory) replaced the original
two-launch stage-1/stage-2 split (_fused_factory, kept under
SOFTMAC_TPU_CONTACT_SPLIT=1): same math, but the (8, N) st1 block no
longer round-trips HBM between launches, and the backward is ONE kernel
(jax.vjp of the composition) instead of the k2b -> k1b chain with its
gst1 block. Measured on the 1e5 flagship: scripts/diag_contact_merged.py.

The forecast point moves well under one table cell per substep (CFL), so
reusing the stage-1 stencil is exact for non-face-crossing particles and a
linear patch extrapolation for the rest — the XLA path implements the
identical semantics, so CPU and TPU agree to f32 roundoff.

The gathers use the TRANSPOSED (32, M) table view so rows land directly in
the (32, T) sublane-major block the kernels consume; the transpose of the
constant table is loop-invariant and hoisted out of the substep scan by XLA.

Backward: custom_vjp with dedicated Pallas kernels. Each backward kernel's
body is ``jax.vjp`` of the SAME in-kernel math function the forward kernel
runs (``_mixed1_math`` / ``_mixed2_math``) — a trace-time transform, so the
two directions cannot drift. The 16 differentiable scalars (bp, bq, bv, bw,
friction, softness, life) enter the backward kernels pre-broadcast to
(1, T) lane rows; their cotangents come back as per-lane contribution rows
that XLA sums over the particle axis (lane reductions inside the kernel
would serialize the VPU). Residuals carry the primal args PLUS the gather
and kernel-A products: re-running them in the bwd costs another ~1 ms
gather per call, while under the rollout's per-env-step remat the
residuals only live through that step's backward (substeps x ~20 MB
transient, well within HBM). The tiny
wrench-assembly tail ((N,)-sized masks + 6 reductions) is differentiated in
XLA. prim-table cotangents are zeros (the tables are constants; the rollout
never differentiates them, so XLA DCEs the zeros).

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

# par row layout (lane index in the (1, 128) parameter block). Lanes 0-15
# are the differentiable scalars, in the order the backward kernels emit
# their cotangent rows; 16+ are non-differentiable geometry constants.
_BP, _BQ, _BV, _BW = 0, 3, 7, 10
_FRICTION, _SOFTNESS, _LIFE, _PUSH_CAP = 13, 14, 15, 16
_LOWER, _UPPER, _INV_DX = 17, 20, 23
_N_DIFF = 16


def _par_unpack(par, T=None, S=1):
    """Split the (1, 128) par block into (s, nd): s = the 16 differentiable
    scalars grouped ((bp), (bq), (bv), (bw), friction, softness, life), nd =
    non-diff constants (lower, upper, inv_dx, push_cap). With ``T`` given the
    s entries are broadcast to (S, T) blocks (so their vjp cotangents are
    per-element contributions instead of in-kernel reductions)."""
    if T is None:
        def P(i):
            return par[0, i]
    else:
        ones = jnp.ones((S, T), jnp.float32)

        def P(i):
            return par[0:1, i:i + 1] * ones
    bp = (P(_BP), P(_BP + 1), P(_BP + 2))
    bq = (P(_BQ), P(_BQ + 1), P(_BQ + 2), P(_BQ + 3))
    bv = (P(_BV), P(_BV + 1), P(_BV + 2))
    bw = (P(_BW), P(_BW + 1), P(_BW + 2))
    s = (bp, bq, bv, bw, P(_FRICTION), P(_SOFTNESS), P(_LIFE))
    nd = ((par[0, _LOWER], par[0, _LOWER + 1], par[0, _LOWER + 2]),
          (par[0, _UPPER], par[0, _UPPER + 1], par[0, _UPPER + 2]),
          par[0, _INV_DX], par[0, _PUSH_CAP])
    return s, nd


def _flat_s(s):
    """s pytree -> the 16 (1, T) rows in par-lane order."""
    bp, bq, bv, bw, fr, so, life = s
    return list(bp) + list(bq) + list(bv) + list(bw) + [fr, so, life]


def _ch(arr, i, S=1):
    """Logical channel ``i`` of a stacked-channel block: rows i*S..(i+1)*S.
    S=1 is the classic (1, T) lane-row layout; S=8 is the sublane-PACKED
    layout where each channel fills a native (8, T/8) f32 vreg tile, so
    every elementwise VPU op runs at 8x the register density (the (1, T)
    rows occupy one sublane of each vreg). The packing permutation is a
    pure XLA reshape outside the kernel (_pack_rows) and is identical for
    every operand, so the in-kernel math is unchanged."""
    return arr[i * S:(i + 1) * S, :]


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


def _combine(rows, fx, in_box, S=1):
    """Trilinear (sdf, unit normal) from a (32*S, T) channel block."""
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
                sdf = sdf + w * _ch(rows, 4 * c + 0, S)
                nx = nx + w * _ch(rows, 4 * c + 1, S)
                ny = ny + w * _ch(rows, 4 * c + 2, S)
                nz = nz + w * _ch(rows, 4 * c + 3, S)
                c += 1
    norm = jnp.sqrt(nx * nx + ny * ny + nz * nz + 1e-14)
    n = (nx / norm, ny / norm, nz / norm)
    zero = jnp.zeros_like(norm)
    n = m33.vwhere(in_box, n, (zero, jnp.ones_like(norm), zero))
    return jnp.where(in_box, sdf, BIG), n


def _mixed1_math(rows, xv, s, nd, res, dt, S=1):
    """Stage 1: trilinear sample + friction-cone response. (8*S, T) out
    channels: p_v1 (0-2), x + dt*p_v1 (3-5), dist (6), zero (7)."""
    bp, bq, bv, bw, friction, softness, _life = s
    lower, upper, inv_dx, _cap = nd
    x = (_ch(xv, 0, S), _ch(xv, 1, S), _ch(xv, 2, S))
    v = (_ch(xv, 3, S), _ch(xv, 4, S), _ch(xv, 5, S))

    qinv = m33.qnorm(m33.qconj(bq))
    p_loc = m33.qrot(qinv, m33.vsub(x, bp))
    in_box, fx = _local_and_fx(p_loc, lower, upper, inv_dx, res)
    dist, n_loc = _combine(rows, fx, in_box, S)
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
        p_v_t, jnp.maximum(0.0, vt_norm + nc * friction) / vt_norm)
    flag = (nc < 0) & (m33.dot(p_v_t, p_v_t) > 1e-60)
    p_v_t = m33.vwhere(flag, vt_fric, p_v_t)
    v_contact = m33.vadd(cv, p_v_t)
    influence = jnp.exp(-jnp.maximum(dist_s, 0.0) * softness)
    v_soft = m33.vadd(cv, m33.vadd(
        m33.vscale(input_v, 1.0 - influence),
        m33.vscale(p_v_t, influence)))
    v_near = m33.vwhere(dist_s > 0, v_soft, v_contact)
    p_v1 = m33.vwhere(mask & (nc < 0), v_near, v)

    return jnp.concatenate(
        [p_v1[0], p_v1[1], p_v1[2],
         x[0] + dt * p_v1[0], x[1] + dt * p_v1[1], x[2] + dt * p_v1[2],
         dist, jnp.zeros_like(dist)], axis=0)


def _mixed2_math(rows, xv, st1, s, nd, res, dt, p_mass, S=1):
    """Stage 2: penetration push-out. Reuses stage 1's stencil rows: the
    forecast point x_new = x + dt*p_v1 moves well under one table cell
    (CFL), so it interpolates the SAME 2x2x2 patch with fractions relative
    to base(x) — exact whenever base(x_new) == base(x), linear patch
    extrapolation for the few face-crossers (sdf.forecast_fx semantics;
    the XLA path in contact._collide_mixed_xla does the identical thing).
    Eliminates the second (N, 32) table gather — the gather, not the math,
    is the contact cost floor (~1 ms per prim per substep at 1e5).
    (8*S, T) out channels: p_v_out (0-2), unmasked reaction force (3-5),
    zeros (6-7)."""
    bp, bq, _bv, _bw, _fr, _so, life = s
    lower, upper, inv_dx, push_cap = nd
    x = (_ch(xv, 0, S), _ch(xv, 1, S), _ch(xv, 2, S))
    v = (_ch(xv, 3, S), _ch(xv, 4, S), _ch(xv, 5, S))
    p_v1 = (_ch(st1, 0, S), _ch(st1, 1, S), _ch(st1, 2, S))
    x_new = (_ch(st1, 3, S), _ch(st1, 4, S), _ch(st1, 5, S))
    dist1 = _ch(st1, 6, S)

    qinv = m33.qnorm(m33.qconj(bq))
    p_loc1 = m33.qrot(qinv, m33.vsub(x, bp))
    p_loc2 = m33.qrot(qinv, m33.vsub(x_new, bp))
    in_box = ((p_loc2[0] >= lower[0]) & (p_loc2[0] < upper[0])
              & (p_loc2[1] >= lower[1]) & (p_loc2[1] < upper[1])
              & (p_loc2[2] >= lower[2]) & (p_loc2[2] < upper[2]))
    fx = []
    for d in range(3):
        pos1 = (p_loc1[d] - lower[d]) * inv_dx
        b1 = jnp.clip(jnp.floor(pos1), 0.0, float(res[d] - 2))
        fx.append((p_loc2[d] - lower[d]) * inv_dx - b1)   # unclamped
    sdf2, n2_loc = _combine(rows, fx, in_box, S)
    n2 = m33.qrot(bq, n2_loc)

    mask = dist1 <= CONTACT_THRESHOLD
    pen = mask & (sdf2 < 0)
    sdf2_s = jnp.where(pen, sdf2, 0.0)
    push = jnp.minimum(-(sdf2_s / dt) * life, push_cap)
    p_v2 = m33.vadd(p_v1, m33.vscale(n2, push))
    p_v_out = m33.vwhere(mask, p_v2, v)

    zero = jnp.zeros_like(dist1)
    return jnp.concatenate(
        [p_v_out[0], p_v_out[1], p_v_out[2],
         (v[0] - p_v_out[0]) * (p_mass / dt),
         (v[1] - p_v_out[1]) * (p_mass / dt),
         (v[2] - p_v_out[2]) * (p_mass / dt),
         zero, zero], axis=0)


def _mixed12_math(rows, xv, s, nd, res, dt, p_mass, S=1):
    """Stages 1+2 composed for the single-launch mixed kernel. (8*S, T)
    out channels: p_v_out (0-2), unmasked reaction force (3-5), dist (6),
    zero (7).
    p_v1/x_new stay internal to the kernel — the split path round-trips
    them through HBM as the (8, T) st1 block between two pallas_calls;
    composing the stages eliminates that block plus one kernel launch per
    prim per substep in BOTH directions (the backward kernel is jax.vjp of
    THIS composition, replacing the k2b -> k1b chain and its gst1 block)."""
    st1 = _mixed1_math(rows, xv, s, nd, res, dt, S)
    out2 = _mixed2_math(rows, xv, st1, s, nd, res, dt, p_mass, S)
    return jnp.concatenate(
        [out2[0:6 * S, :], _ch(st1, 6, S), jnp.zeros_like(_ch(st1, 6, S))],
        axis=0)


def _make_mixed12_kernel(res, dt, p_mass, S=1):
    def kernel(rows_ref, xv_ref, par_ref, out_ref):
        s, nd = _par_unpack(par_ref[:])
        out_ref[:] = _mixed12_math(rows_ref[:], xv_ref[:], s, nd, res, dt,
                                   p_mass, S)
    return kernel


def _make_mixed12_bwd_kernel(res, dt, p_mass, S=1):
    def kernel(rows_ref, xv_ref, g_ref, par_ref, gxv_ref, gpar_ref):
        T = g_ref.shape[1]
        s, nd = _par_unpack(par_ref[:], T, S)
        rows = rows_ref[:]

        def f(xv, s):
            return _mixed12_math(rows, xv, s, nd, res, dt, p_mass, S)

        _, vjp = jax.vjp(f, xv_ref[:], s)
        gxv, gs = vjp(g_ref[:])
        gxv_ref[:] = gxv
        gpar_ref[:] = jnp.concatenate(_flat_s(gs), axis=0)
    return kernel


def _particle_math(rows, xv, s, nd, res, dt, p_mass, S=1):
    """Penalty particle contact (contact.collide_particle semantics,
    Coulomb-clamped friction): trilinear sample + spring impulse, one
    stage. (8*S, T) out channels: masked impulse (0-2), mask (3),
    zeros (4-7)."""
    bp, bq, bv, bw, friction, _so, _life = s
    lower, upper, inv_dx, _cap = nd
    x = (_ch(xv, 0, S), _ch(xv, 1, S), _ch(xv, 2, S))
    v = (_ch(xv, 3, S), _ch(xv, 4, S), _ch(xv, 5, S))

    qinv = m33.qnorm(m33.qconj(bq))
    p_loc = m33.qrot(qinv, m33.vsub(x, bp))
    in_box, fx = _local_and_fx(p_loc, lower, upper, inv_dx, res)
    dist, n_loc = _combine(rows, fx, in_box, S)
    D = m33.qrot(bq, n_loc)

    c = dist - CONTACT_THRESHOLD
    mask = c < 0.0
    c = jnp.where(mask, c, 0.0)

    r = m33.vsub(x, bp)
    cv = m33.qrot(m33.qnorm(bq),
                  m33.vadd(bv, m33.cross(bw, m33.qrot(
                      m33.qconj(m33.qnorm(bq)), r))))
    input_v = m33.vsub(v, cv)
    nc = m33.dot(input_v, D)
    p_v_t = m33.vsub(input_v, m33.vscale(D, nc))

    k1 = 50.0
    imp1 = m33.vscale(D, -(c * k1 * dt))
    vt_norm = jnp.sqrt(m33.dot(p_v_t, p_v_t) + 1e-8)
    fric_mag = jnp.minimum(jnp.abs(nc) * friction * dt, p_mass * vt_norm)
    imp2 = m33.vscale(p_v_t, -fric_mag / vt_norm)
    imp = m33.vadd(imp1, imp2)
    imp = tuple(jnp.where(mask, i, 0.0) for i in imp)

    zero = jnp.zeros_like(dist)
    return jnp.concatenate(
        [imp[0], imp[1], imp[2], mask.astype(jnp.float32),
         zero, zero, zero, zero], axis=0)


# ---------------------------------------------------------------------------
# Forward kernels: unpack par as 0-d scalars, run the shared math.
# ---------------------------------------------------------------------------

def _make_mixed1_kernel(res, dt):
    def kernel(rows_ref, xv_ref, par_ref, out_ref):
        s, nd = _par_unpack(par_ref[:])
        out_ref[:] = _mixed1_math(rows_ref[:], xv_ref[:], s, nd, res, dt)
    return kernel


def _make_mixed2_kernel(res, dt, p_mass):
    def kernel(rows2_ref, xv_ref, st1_ref, par_ref, out_ref):
        s, nd = _par_unpack(par_ref[:])
        out_ref[:] = _mixed2_math(rows2_ref[:], xv_ref[:], st1_ref[:], s, nd,
                                  res, dt, p_mass)
    return kernel


# ---------------------------------------------------------------------------
# Backward kernels: jax.vjp of the shared math at trace time. Scalars enter
# broadcast to (1, T) so cotangents come out as per-lane rows (16, T).
# ---------------------------------------------------------------------------

def _make_mixed1_bwd_kernel(res, dt):
    def kernel(rows_ref, xv_ref, g_ref, par_ref, gxv_ref, gpar_ref):
        T = g_ref.shape[1]
        s, nd = _par_unpack(par_ref[:], T)
        rows = rows_ref[:]

        def f(xv, s):
            return _mixed1_math(rows, xv, s, nd, res, dt)

        _, vjp = jax.vjp(f, xv_ref[:], s)
        gxv, gs = vjp(g_ref[:])
        gxv_ref[:] = gxv
        gpar_ref[:] = jnp.concatenate(_flat_s(gs), axis=0)
    return kernel


def _make_mixed2_bwd_kernel(res, dt, p_mass):
    def kernel(rows2_ref, xv_ref, st1_ref, g_ref, par_ref,
               gxv_ref, gst1_ref, gpar_ref):
        T = g_ref.shape[1]
        s, nd = _par_unpack(par_ref[:], T)
        rows2 = rows2_ref[:]

        def f(xv, st1, s):
            return _mixed2_math(rows2, xv, st1, s, nd, res, dt, p_mass)

        _, vjp = jax.vjp(f, xv_ref[:], st1_ref[:], s)
        gxv, gst1, gs = vjp(g_ref[:])
        gxv_ref[:] = gxv
        gst1_ref[:] = gst1
        gpar_ref[:] = jnp.concatenate(_flat_s(gs), axis=0)
    return kernel


def _make_particle_kernel(res, dt, p_mass, S=1):
    def kernel(rows_ref, xv_ref, par_ref, out_ref):
        s, nd = _par_unpack(par_ref[:])
        out_ref[:] = _particle_math(rows_ref[:], xv_ref[:], s, nd, res, dt,
                                    p_mass, S)
    return kernel


def _make_particle_bwd_kernel(res, dt, p_mass, S=1):
    def kernel(rows_ref, xv_ref, g_ref, par_ref, gxv_ref, gpar_ref):
        T = g_ref.shape[1]
        s, nd = _par_unpack(par_ref[:], T, S)
        rows = rows_ref[:]

        def f(xv, s):
            return _particle_math(rows, xv, s, nd, res, dt, p_mass, S)

        _, vjp = jax.vjp(f, xv_ref[:], s)
        gxv, gs = vjp(g_ref[:])
        gxv_ref[:] = gxv
        gpar_ref[:] = jnp.concatenate(_flat_s(gs), axis=0)
    return kernel


# ---------------------------------------------------------------------------
# pallas_call plumbing.
# ---------------------------------------------------------------------------

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


def _pack_rows(a, S):
    """(R, N) -> (R*S, N/S): split every channel row into S contiguous
    segments stacked as sublanes (channel c -> rows c*S..(c+1)*S). A pure
    XLA reshape; which particles share a kernel block changes, but the
    math is elementwise so only the (inverse) unpack ordering matters."""
    R, N = a.shape
    return a.reshape(R, S, N // S).reshape(R * S, N // S)


def _unpack_rows(a, S):
    RS, M = a.shape
    return a.reshape(RS // S, S, M).reshape(RS // S, S * M)


def _run_kernel(kernel, rows_blocks, dense_blocks, n, out_rows=(8,), S=1):
    """rows_blocks: list of (32, N); dense_blocks: (R<=8, N) blocks with the
    constant (1, 128) par block LAST. out_rows: row count per output; returns
    one array or a tuple, each trimmed to (:, :n). With S>1 every operand
    and output is sublane-packed (_pack_rows) so each logical channel fills
    native (S, tile/S) vreg tiles inside the kernel (see _ch)."""
    tile = _TILE_N
    par = dense_blocks[-1]
    arrs, n_pad = _pad8(list(rows_blocks) + list(dense_blocks[:-1]), n, tile)
    if S > 1:
        arrs = [_pack_rows(a, S) for a in arrs]

    def spec(rows):
        return pl.BlockSpec((rows * S, tile // S), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    in_specs = ([spec(32)] * len(rows_blocks)
                + [spec(a.shape[0] // S) for a in arrs[len(rows_blocks):]]
                + [pl.BlockSpec((1, 128), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)])
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=in_specs,
        out_specs=[spec(r) for r in out_rows],
        out_shape=[jax.ShapeDtypeStruct((r * S, n_pad // S), jnp.float32)
                   for r in out_rows],
        interpret=_INTERPRET,
    )(*arrs, par)
    if S > 1:
        out = tuple(_unpack_rows(o, S) for o in out)
    out = tuple(o[:, :n] for o in out)
    return out[0] if len(out) == 1 else out


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


def _tail(out2, st1, x, bp3):
    """Mask the reaction force, build the wrench (XLA; (N,)-sized)."""
    p_v_out = (out2[0], out2[1], out2[2])
    mask = st1[6] <= CONTACT_THRESHOLD
    b_f = tuple(jnp.where(mask, out2[3 + d], 0.0) for d in range(3))
    r = m33.vsub(x, bp3)
    b_t = m33.cross(r, b_f)
    wrench = jnp.stack([jnp.sum(c) for c in (b_f + b_t)])
    return p_v_out, wrench


@functools.lru_cache(maxsize=None)
def _fused_factory(res, dt, p_mass, push_cap):
    """custom_vjp collide_mixed for static (res, dt, p_mass, push_cap)."""
    k1 = _make_mixed1_kernel(res, dt)
    k2 = _make_mixed2_kernel(res, dt, p_mass)
    k1b = _make_mixed1_bwd_kernel(res, dt)
    k2b = _make_mixed2_bwd_kernel(res, dt, p_mass)

    def parts(prim, bp, bq, bv, bw, friction, softness, x, p_v, life):
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

        # stage 2 REUSES rows1 (forecast sample against the same stencil —
        # see _mixed2_math); no second table gather
        out2 = _run_kernel(k2, [rows1], [xv, st1, par], n)
        return par, xv, rows1, st1, out2

    @jax.custom_vjp
    def fused(prim, bp, bq, bv, bw, friction, softness, x, p_v, life):
        _, _, _, st1, out2 = parts(prim, bp, bq, bv, bw, friction,
                                   softness, x, p_v, life)
        return _tail(out2, st1, x, (bp[0], bp[1], bp[2]))

    def _fwd(*args):
        # carry the gather + kernel products as residuals: re-running them
        # in _bwd costs another (N, 32) gather (~1 ms at 1e5) per call, and
        # under the rollout's per-env-step remat the residuals only live
        # through that step's backward (substeps x ~20 MB transient)
        pieces = parts(*args)
        prim, bp = args[0], args[1]
        st1, out2 = pieces[3], pieces[4]
        out = _tail(out2, st1, args[7], (bp[0], bp[1], bp[2]))
        return out, (args, pieces)

    def _bwd(res, g):
        res_args, pieces = res
        prim, bp, bq, bv, bw, friction, softness, x, p_v, life = res_args
        n = x[0].shape[0]
        par, xv, rows1, st1, out2 = pieces
        bp3 = (bp[0], bp[1], bp[2])

        # MEASUREMENT-ONLY knob (scripts/diag_contact_bwd.py): zero the
        # contact backward to bisect its end-to-end share. Gradients are
        # WRONG under this flag — never set it outside a timing run.
        if os.environ.get("SOFTMAC_TPU_CONTACT_BWD") == "zero":
            zero_prim = jax.tree_util.tree_map(jnp.zeros_like, prim)
            zv = tuple(jnp.zeros_like(x[d]) for d in range(3))
            zs = jnp.zeros((), jnp.float32)
            return (zero_prim, jnp.zeros_like(bp), jnp.zeros_like(bq),
                    jnp.zeros_like(bv), jnp.zeros_like(bw),
                    zs.astype(friction.dtype), zs.astype(softness.dtype),
                    zv, zv, zs.astype(life.dtype))

        _, vjp_tail = jax.vjp(_tail, out2, st1, x, bp3)
        g_out2, g_st1_t, g_x_t, g_bp_t = vjp_tail(g)

        gxv_b, gst1_b, gpar_b = _run_kernel(
            k2b, [rows1], [xv, st1, g_out2, par], n, out_rows=(8, 8, 16))
        gxv_a, gpar_a = _run_kernel(
            k1b, [rows1], [xv, gst1_b + g_st1_t, par], n, out_rows=(8, 16))

        gpar = jnp.sum(gpar_a, axis=1) + jnp.sum(gpar_b, axis=1)
        g_x = tuple(gxv_a[d] + gxv_b[d] + g_x_t[d] for d in range(3))
        g_v = tuple(gxv_a[3 + d] + gxv_b[3 + d] for d in range(3))
        g_bp = gpar[_BP:_BP + 3] + jnp.stack(list(g_bp_t))
        zero_prim = jax.tree_util.tree_map(jnp.zeros_like, prim)
        return (zero_prim,
                g_bp.astype(bp.dtype),
                gpar[_BQ:_BQ + 4].astype(bq.dtype),
                gpar[_BV:_BV + 3].astype(bv.dtype),
                gpar[_BW:_BW + 3].astype(bw.dtype),
                gpar[_FRICTION].astype(friction.dtype),
                gpar[_SOFTNESS].astype(softness.dtype),
                g_x, g_v,
                gpar[_LIFE].astype(life.dtype))

    fused.defvjp(_fwd, _bwd)
    return fused


def _tail12(out, x, bp3):
    """Wrench tail for the merged kernel's (8, N) output (dist in row 6)."""
    p_v_out = (out[0], out[1], out[2])
    mask = out[6] <= CONTACT_THRESHOLD
    b_f = tuple(jnp.where(mask, out[3 + d], 0.0) for d in range(3))
    r = m33.vsub(x, bp3)
    b_t = m33.cross(r, b_f)
    wrench = jnp.stack([jnp.sum(c) for c in (b_f + b_t)])
    return p_v_out, wrench


@functools.lru_cache(maxsize=None)
def _fused12_factory(res, dt, p_mass, push_cap, S=8):
    """Single-launch custom_vjp collide_mixed: ONE forward kernel (stages
    1+2 composed, no st1 HBM round-trip) and ONE backward kernel (jax.vjp
    of the composition). Same math as _fused_factory's k1->k2 / k2b->k1b
    chains; measured A/B + gradient parity in scripts/diag_contact_merged
    .py. S=8 sublane-packs every channel (see _ch/_pack_rows) so the
    VPU-bound backward runs at full vreg density; legacy selections:
    SOFTMAC_TPU_CONTACT_SPLIT=1 (two-launch split family),
    SOFTMAC_TPU_CONTACT_PACKED=0 (merged, unpacked (1, T) rows)."""
    k12 = _make_mixed12_kernel(res, dt, p_mass, S)
    k12b = _make_mixed12_bwd_kernel(res, dt, p_mass, S)

    def parts(prim, bp, bq, bv, bw, friction, softness, x, p_v, life):
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
        out = _run_kernel(k12, [rows1], [xv, par], n, S=S)
        return par, xv, rows1, out

    @jax.custom_vjp
    def fused(prim, bp, bq, bv, bw, friction, softness, x, p_v, life):
        _, _, _, out = parts(prim, bp, bq, bv, bw, friction, softness,
                             x, p_v, life)
        return _tail12(out, x, (bp[0], bp[1], bp[2]))

    def _fwd(*args):
        # residuals carry the gather + kernel product (see _fused_factory)
        pieces = parts(*args)
        bp = args[1]
        out = _tail12(pieces[3], args[7], (bp[0], bp[1], bp[2]))
        return out, (args, pieces)

    def _bwd(res, g):
        res_args, pieces = res
        prim, bp, bq, bv, bw, friction, softness, x, p_v, life = res_args
        n = x[0].shape[0]
        par, xv, rows1, out = pieces
        bp3 = (bp[0], bp[1], bp[2])

        # MEASUREMENT-ONLY knob (scripts/diag_contact_bwd.py): see
        # _fused_factory._bwd.
        if os.environ.get("SOFTMAC_TPU_CONTACT_BWD") == "zero":
            zero_prim = jax.tree_util.tree_map(jnp.zeros_like, prim)
            zv = tuple(jnp.zeros_like(x[d]) for d in range(3))
            zs = jnp.zeros((), jnp.float32)
            return (zero_prim, jnp.zeros_like(bp), jnp.zeros_like(bq),
                    jnp.zeros_like(bv), jnp.zeros_like(bw),
                    zs.astype(friction.dtype), zs.astype(softness.dtype),
                    zv, zv, zs.astype(life.dtype))

        _, vjp_tail = jax.vjp(_tail12, out, x, bp3)
        g_out, g_x_t, g_bp_t = vjp_tail(g)

        gxv, gpar_rows = _run_kernel(
            k12b, [rows1], [xv, g_out, par], n, out_rows=(8, 16), S=S)
        gpar = jnp.sum(gpar_rows, axis=1)
        g_x = tuple(gxv[d] + g_x_t[d] for d in range(3))
        g_v = tuple(gxv[3 + d] for d in range(3))
        g_bp = gpar[_BP:_BP + 3] + jnp.stack(list(g_bp_t))
        zero_prim = jax.tree_util.tree_map(jnp.zeros_like, prim)
        return (zero_prim,
                g_bp.astype(bp.dtype),
                gpar[_BQ:_BQ + 4].astype(bq.dtype),
                gpar[_BV:_BV + 3].astype(bv.dtype),
                gpar[_BW:_BW + 3].astype(bw.dtype),
                gpar[_FRICTION].astype(friction.dtype),
                gpar[_SOFTNESS].astype(softness.dtype),
                g_x, g_v,
                gpar[_LIFE].astype(life.dtype))

    fused.defvjp(_fwd, _bwd)
    return fused


def _tail_particle(out, x, bp3, dt):
    """Reaction wrench from the in-kernel (already masked) impulse."""
    imp = (out[0], out[1], out[2])
    b_f = tuple(i * (-1.0 / dt) for i in imp)
    r = m33.vsub(x, bp3)
    b_t = m33.cross(r, b_f)
    wrench = jnp.stack([jnp.sum(c) for c in (b_f + b_t)])
    return imp, wrench


@functools.lru_cache(maxsize=None)
def _particle_factory(res, dt, p_mass, S=8):
    """custom_vjp collide_particle for static (res, dt, p_mass): one table
    gather + ONE kernel (no forecast stage in the penalty model). S=8
    sublane-packs the channels (see _ch); SOFTMAC_TPU_CONTACT_PACKED=0
    selects the unpacked (1, T)-row layout."""
    k1 = _make_particle_kernel(res, dt, p_mass, S)
    k1b = _make_particle_bwd_kernel(res, dt, p_mass, S)

    def parts(prim, bp, bq, bv, bw, friction, x, p_v):
        n = x[0].shape[0]
        par = _pack_par(prim, bp, bq, bv, bw, friction,
                        jnp.float32(0.0), jnp.float32(0.0), 0.0)
        nbt = prim.neighborhood.T
        qinv = m33.qnorm(m33.qconj((bq[0], bq[1], bq[2], bq[3])))
        bp3 = (bp[0], bp[1], bp[2])
        xv = jnp.concatenate([jnp.stack(list(x)), jnp.stack(list(p_v)),
                              jnp.zeros((2, n), jnp.float32)], axis=0)
        p_loc = m33.qrot(qinv, m33.vsub(x, bp3))
        rows1 = nbt[:, _cell_index(prim, p_loc)]
        out = _run_kernel(k1, [rows1], [xv, par], n, S=S)
        return par, xv, rows1, out

    @jax.custom_vjp
    def fused(prim, bp, bq, bv, bw, friction, x, p_v):
        _, _, _, out = parts(prim, bp, bq, bv, bw, friction, x, p_v)
        return _tail_particle(out, x, (bp[0], bp[1], bp[2]), dt)

    def _fwd(*args):
        # residuals carry the gather + kernel products (see _fused_factory)
        pieces = parts(*args)
        bp = args[1]
        out = _tail_particle(pieces[3], args[6], (bp[0], bp[1], bp[2]), dt)
        return out, (args, pieces)

    def _bwd(res, g):
        res_args, pieces = res
        prim, bp, bq, bv, bw, friction, x, p_v = res_args
        n = x[0].shape[0]
        par, xv, rows1, out = pieces
        bp3 = (bp[0], bp[1], bp[2])

        _, vjp_tail = jax.vjp(
            lambda o, x_, b: _tail_particle(o, x_, b, dt), out, x, bp3)
        g_out, g_x_t, g_bp_t = vjp_tail(g)

        gxv, gpar_rows = _run_kernel(
            k1b, [rows1], [xv, g_out, par], n, out_rows=(8, 16), S=S)
        gpar = jnp.sum(gpar_rows, axis=1)
        g_x = tuple(gxv[d] + g_x_t[d] for d in range(3))
        g_v = tuple(gxv[3 + d] for d in range(3))
        g_bp = gpar[_BP:_BP + 3] + jnp.stack(list(g_bp_t))
        zero_prim = jax.tree_util.tree_map(jnp.zeros_like, prim)
        return (zero_prim,
                g_bp.astype(bp.dtype),
                gpar[_BQ:_BQ + 4].astype(bq.dtype),
                gpar[_BV:_BV + 3].astype(bv.dtype),
                gpar[_BW:_BW + 3].astype(bw.dtype),
                gpar[_FRICTION].astype(friction.dtype),
                g_x, g_v)

    fused.defvjp(_fwd, _bwd)
    return fused


def _pack_S() -> int:
    """Sublane-packing factor: 8 (default) unless
    SOFTMAC_TPU_CONTACT_PACKED=0 selects the legacy (1, T)-row layout."""
    return 1 if os.environ.get("SOFTMAC_TPU_CONTACT_PACKED", "1") == "0" else 8


def collide_particle_fused(prim, body_pos, body_quat, body_v, body_w,
                           friction, x, p_v, *, p_mass, dt):
    """Drop-in fused replacement for the XLA collide_particle (TPU f32)."""
    fn = _particle_factory(tuple(prim.res), float(dt), float(p_mass),
                           _pack_S())
    return fn(prim, jnp.asarray(body_pos, jnp.float32),
              jnp.asarray(body_quat, jnp.float32),
              jnp.asarray(body_v, jnp.float32),
              jnp.asarray(body_w, jnp.float32),
              jnp.asarray(friction, jnp.float32), x, p_v)


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
    if os.environ.get("SOFTMAC_TPU_CONTACT_SPLIT"):
        fn = _fused_factory(tuple(prim.res), float(dt), float(p_mass), cap)
    else:
        fn = _fused12_factory(tuple(prim.res), float(dt), float(p_mass),
                              cap, _pack_S())
    return fn(prim, jnp.asarray(body_pos, jnp.float32),
              jnp.asarray(body_quat, jnp.float32),
              jnp.asarray(body_v, jnp.float32),
              jnp.asarray(body_w, jnp.float32),
              jnp.asarray(friction, jnp.float32),
              jnp.asarray(softness, jnp.float32), x, p_v,
              jnp.asarray(life, jnp.float32))
