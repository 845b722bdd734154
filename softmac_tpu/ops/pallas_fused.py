"""Pallas TPU kernels: fully-fused B-spline transfers (P2G / G2P).

The production XLA path (mpm.p2g_dense / g2p_dense) materializes the three
Khatri-Rao pair matrices H*[(y,z), p] — 3 x (wy*wz, N) ~ 615 MB at 1e5
particles — in HBM, then contracts them on the MXU; phase profiling puts
that build + its re-reads at most of the forward substep (the matmuls
themselves are ~0.35 ms). These kernels never let H touch HBM: each
particle tile rebuilds its (wy*wz, T) slab in VMEM with the per-y-row
sublane broadcast proven out in ops/pallas_kr.py (no cross-sublane
relayout — the mistake that sank the scripts/experiment_pallas_splat.py experiment), feeds it straight
to the MXU, and accumulates the grid in a VMEM-resident output block
across the sequential tile grid.

HBM traffic per substep drops from ~1.6 GB (H writes + two rounds of H
reads + R builds) to ~150 MB (the per-axis weight matrices + particle
channels in, grids/particle rows out).

Reference semantics: softmac/engine/mpm_simulator.py p2g(:199) / g2p(:300)
— identical math to mpm.p2g_dense / g2p_dense, verified against them (and
transitively against the NumPy f64 oracle) by tests/test_pallas_fused.py.

Layout contract (see engine/mpm.py docstring): particle axis LAST (lanes);
sizes = (wx, wy, wz); H row (y, z) = y*wz + z; grid channels (wy*wz, wx).
All shapes static, f32, window sizes multiples of 8 (every demo config's
active_window qualifies; the XLA path remains for CPU/f64/full-grid).

Backward: custom_vjp with dedicated fused kernels. p2g/g2p are bilinear
(weights x values), so every VJP is another pair of transfer-shaped
contractions with the same VMEM slab structure as the forward; cotangents
are verified against jax.vjp of the XLA reference implementations (which
also serve as the ``lax.platform_dependent`` CPU branch) by
tests/test_pallas_fused.py.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

# Particle-tile width. Each grid step carries ~4 us of fixed cost (DMA
# latency + semaphores); at 1e5 particles, 512-wide tiles x 8 kernel calls
# per substep spent ~6 ms/substep on that overhead alone. 1024 halves it;
# kernels with many slab scratches pick a smaller local tile to stay under
# the 16 MB scoped-vmem budget.
_TILE_N = 1024
_INTERPRET = False   # tests flip this to run the kernels on CPU

# In-kernel dot precision. Mosaic only lowers DEFAULT (1 bf16 MXU pass)
# and HIGHEST (6 passes); the production setting "high" (bf16_3x, what the
# XLA matmuls use — see engine/mpm.py) is implemented MANUALLY below as the
# classic 3-pass split a = hi + lo (hi = bf16(a), lo = bf16(a - hi)):
#   a @ b = hi@bhi + hi@blo + lo@bhi   (lo@blo ~ 2^-16 relative, dropped)
# which matches XLA HIGH bit-for-bit in structure and halves the MXU time
# of HIGHEST. Env SOFTMAC_TPU_MATMUL_PRECISION selects the mode.
_PRECISION_MODE = os.environ.get("SOFTMAC_TPU_MATMUL_PRECISION", "high")


def _dg(a, b, dims, precision):
    return lax.dot_general(a, b, (dims, ((), ())), precision=precision,
                           preferred_element_type=jnp.float32)


def _dot(a, b, dims):
    if _PRECISION_MODE == "default":
        return _dg(a, b, dims, lax.Precision.DEFAULT)
    if _PRECISION_MODE == "highest":
        return _dg(a, b, dims, lax.Precision.HIGHEST)
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    p = lax.Precision.DEFAULT
    return _dg(ah, bh, dims, p) + _dg(ah, bl, dims, p) + _dg(al, bh, dims, p)


def _dot_t(a, b):
    """(A, T) x (B, T) -> (A, B), contracting the lane/tile axis."""
    return _dot(a, b, (((1,), (1,))))


def _dot_rows(a, b):
    """(R, K) x (K, T) -> (R, T), contracting the inner axis."""
    return _dot(a, b, (((1,), (0,))))


def _dot00(a, b):
    """(R, A) x (R, B) -> (A, B), contracting axis 0."""
    return _dot(a, b, (((0,), (0,))))


# Backward-pass dot precision (VERDICT r3 #2). The backward is ~2/3 of the
# kernels' MXU work; gradients tolerate lower precision than the forward
# state (they are consumed by an optimizer, not integrated for thousands of
# steps). SOFTMAC_TPU_BWD_DOT_PASSES selects the MXU-pass count for dots
# inside BACKWARD kernels only:
#   3 (default): same bf16x3 as the forward — bit-identical to today.
#   2: a@b ~ ah@bh + al@bh  (full a mantissa, b truncated to bf16).
#   1: plain bf16 single pass.
# Read at TRACE time (module attribute, not import-time constant) so an
# in-process A/B can flip it between env builds; gated by the coupled
# oracle + FD-gradient + convergence gates before any production use.
_BWD_PASSES = int(os.environ.get("SOFTMAC_TPU_BWD_DOT_PASSES", "3"))


def _dot_bwd(a, b, dims):
    passes = _BWD_PASSES
    if passes >= 3 or _PRECISION_MODE != "high":
        return _dot(a, b, dims)
    p = lax.Precision.DEFAULT
    ah = a.astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    if passes <= 1:
        return _dg(ah, bh, dims, p)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    return _dg(ah, bh, dims, p) + _dg(al, bh, dims, p)


def _dot_t_bwd(a, b):
    return _dot_bwd(a, b, (((1,), (1,))))


def _dot_rows_bwd(a, b):
    return _dot_bwd(a, b, (((1,), (0,))))


def _dot00_bwd(a, b):
    return _dot_bwd(a, b, (((0,), (0,))))


# XLA-side dots for the reference implementations (the platform_dependent
# CPU branch and the test baseline): plain dot_general at the production
# precision — XLA accepts HIGH everywhere, and on CPU it is exact f32.
_PRECISION_XLA = {
    "default": lax.Precision.DEFAULT,
    "high": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
}[_PRECISION_MODE]


def _dot_t_ref(a, b):
    return _dg(a, b, ((1,), (1,)), _PRECISION_XLA)


def _dot_rows_ref(a, b):
    return _dg(a, b, ((1,), (0,)), _PRECISION_XLA)


# ---------------------------------------------------------------------------
# Channel packing.
#
# P2G consumes 13 per-particle scalars: mass, momentum (3), and the
# dx-scaled affine matrix (9). They ride in one (16, N) array (rows 13-15
# zero) so the kernel sees a single sublane-aligned block:
#   row 0: mass   rows 1-3: mom_d   row 4+3d+j: dx * affine[d][j]
# ---------------------------------------------------------------------------

def pack_channels(mass, mom, affine_dx):
    """mass (N,), mom: 3-tuple of (N,), affine_dx: 3x3 nest of (N,) already
    scaled by dx. Returns (16, N) f32."""
    rows = [mass, mom[0], mom[1], mom[2]]
    for d in range(3):
        rows += [affine_dx[d][0], affine_dx[d][1], affine_dx[d][2]]
    z = jnp.zeros_like(mass)
    rows += [z, z, z]
    return jnp.stack(rows)


# ---------------------------------------------------------------------------
# XLA reference implementations (semantics + phase-1 VJP).
# ---------------------------------------------------------------------------

def _p2g_ref(Wx, WxD, Wy, WDy, Wz, WDz, chan):
    """Returns (gm (wy*wz, wx), gmom (wy*wz, 3*wx))."""
    wx = Wx.shape[0]
    wy, wz = Wy.shape[0], Wz.shape[0]

    def kr(a, b):
        return (a[:, None, :] * b[None, :, :]).reshape(wy * wz, -1)

    H, HDy, HDz = kr(Wy, Wz), kr(WDy, Wz), kr(Wy, WDz)
    # R_H rows: [Wx*mass | Wx*mom_d + WxD*a_d0 for d]
    r_h = [Wx * chan[0][None, :]]
    for d in range(3):
        r_h.append(Wx * chan[1 + d][None, :] + WxD * chan[4 + 3 * d][None, :])
    r_h = jnp.concatenate(r_h, axis=0)                       # (4*wx, N)
    r_dy = jnp.concatenate(
        [Wx * chan[5 + 3 * d][None, :] for d in range(3)], axis=0)
    r_dz = jnp.concatenate(
        [Wx * chan[6 + 3 * d][None, :] for d in range(3)], axis=0)
    o1 = _dot_t_ref(H, r_h)                                  # (wy*wz, 4*wx)
    o2 = _dot_t_ref(HDy, r_dy)                               # (wy*wz, 3*wx)
    o3 = _dot_t_ref(HDz, r_dz)
    gm = o1[:, :wx]
    gmom = o1[:, wx:] + o2 + o3
    return gm, gmom


def _g2p_ref(Wx, WxD, Wy, WDy, Wz, WDz, gv0, gv1, gv2):
    """gv0-2: (wy*wz, wx) grid velocity channels. Returns (16, N): rows
    [v0 v1 v2, m00..m22, 0 0 0 0] where m_dj are the UNSCALED C rows
    (multiply by 4*inv_dx outside)."""
    wy, wz = Wy.shape[0], Wz.shape[0]

    def kr(a, b):
        return (a[:, None, :] * b[None, :, :]).reshape(wy * wz, -1)

    H, HDy, HDz = kr(Wy, Wz), kr(WDy, Wz), kr(Wy, WDz)
    rows = []
    m_rows = []
    for gvd in (gv0, gv1, gv2):
        A = _dot_rows_ref(gvd, Wx)      # (wy*wz, N)
        B = _dot_rows_ref(gvd, WxD)
        rows.append(jnp.sum(H * A, axis=0))
        m_rows.append([jnp.sum(H * B, axis=0),
                       jnp.sum(HDy * A, axis=0),
                       jnp.sum(HDz * A, axis=0)])
    out = rows + [m for d in range(3) for m in m_rows[d]]
    z = jnp.zeros_like(out[0])
    out += [z, z, z, z]
    return jnp.stack(out)


def _splat_ref(Wx, Wy, Wz, vals):
    """vals (3, N) plain channels -> grid (wy*wz, 3*wx). (grid_op_mixed4's
    correction scatter: no derivative weights.)"""
    wy, wz = Wy.shape[0], Wz.shape[0]
    H = (Wy[:, None, :] * Wz[None, :, :]).reshape(wy * wz, -1)
    r = jnp.concatenate([Wx * vals[d][None, :] for d in range(3)], axis=0)
    return _dot_t_ref(H, r)


def _gather_ref(Wx, Wy, Wz, gv0, gv1, gv2):
    """gv0-2 (wy*wz, wx) -> (3, N) interpolated velocity (grid_op_mixed2)."""
    wy, wz = Wy.shape[0], Wz.shape[0]
    H = (Wy[:, None, :] * Wz[None, :, :]).reshape(wy * wz, -1)
    rows = []
    for gvd in (gv0, gv1, gv2):
        A = _dot_rows_ref(gvd, Wx)
        rows.append(jnp.sum(H * A, axis=0))
    return jnp.stack(rows)


# ---------------------------------------------------------------------------
# Kernels.
# ---------------------------------------------------------------------------

def _p2g_kernel(wx_ref, wxd_ref, wy_ref, wdy_ref, wz_ref, wdz_ref, chan_ref,
                o1_ref, o2_ref, o3_ref, h_ref, r_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        o1_ref[:] = jnp.zeros_like(o1_ref)
        o2_ref[:] = jnp.zeros_like(o2_ref)
        o3_ref[:] = jnp.zeros_like(o3_ref)

    Wx, WxD = wx_ref[:], wxd_ref[:]               # (wx, T)
    Wy, WDy = wy_ref[:], wdy_ref[:]               # (wy, T)
    Wz, WDz = wz_ref[:], wdz_ref[:]               # (wz, T)
    chan = chan_ref[:]                            # (16, T)
    wx = Wx.shape[0]
    n_y, n_z = Wy.shape[0], Wz.shape[0]

    # R_H: [Wx*mass | Wx*mom_d + WxD*a_d0]
    r_ref[0:wx, :] = Wx * chan[0:1, :]
    for d in range(3):
        r_ref[(1 + d) * wx:(2 + d) * wx, :] = (
            Wx * chan[1 + d:2 + d, :] + WxD * chan[4 + 3 * d:5 + 3 * d, :])
    for y in range(n_y):
        h_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * Wz
    o1_ref[:] += _dot_t(h_ref[:], r_ref[:])

    # Dy term: HDy @ [Wx*a_d1]
    for d in range(3):
        r_ref[d * wx:(d + 1) * wx, :] = Wx * chan[5 + 3 * d:6 + 3 * d, :]
    for y in range(n_y):
        h_ref[y * n_z:(y + 1) * n_z, :] = WDy[y:y + 1, :] * Wz
    o2_ref[:] += _dot_t(h_ref[:], r_ref[0:3 * wx, :])

    # Dz term: HDz @ [Wx*a_d2]
    for d in range(3):
        r_ref[d * wx:(d + 1) * wx, :] = Wx * chan[6 + 3 * d:7 + 3 * d, :]
    for y in range(n_y):
        h_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * WDz
    o3_ref[:] += _dot_t(h_ref[:], r_ref[0:3 * wx, :])


def _g2p_kernel(wx_ref, wxd_ref, wy_ref, wdy_ref, wz_ref, wdz_ref,
                gvp_ref, out_ref, h_ref, hdy_ref, hdz_ref):
    Wx, WxD = wx_ref[:], wxd_ref[:]
    Wy, WDy = wy_ref[:], wdy_ref[:]
    Wz, WDz = wz_ref[:], wdz_ref[:]
    wx = Wx.shape[0]
    n_y, n_z = Wy.shape[0], Wz.shape[0]

    for y in range(n_y):
        h_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * Wz
        hdy_ref[y * n_z:(y + 1) * n_z, :] = WDy[y:y + 1, :] * Wz
        hdz_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * WDz
    H, HDy, HDz = h_ref[:], hdy_ref[:], hdz_ref[:]

    # M-matrix formulation: contract the 512-row H axis on the MXU with the
    # PACKED (wy*wz, 3*wx) grid so all three channels ride one 120-wide dot
    # (a 40-wide dot uses 1/3 of the MXU), then reduce over only wx=40
    # sublanes on the VPU. A sum over the (wy*wz, T) slab itself costs ~13x
    # the vector instructions. Identity: sum_r H[r,t]*B_d[r,t]
    # = sum_x WxD[x,t]*M_d[x,t], so the WxD channel reuses M_d.
    gvp = gvp_ref[:]
    M_all = _dot00(gvp, H)                        # (3*wx, T)
    MDy_all = _dot00(gvp, HDy)
    MDz_all = _dot00(gvp, HDz)
    for d in range(3):
        M = M_all[d * wx:(d + 1) * wx]            # sublane slice, cheap
        MDy = MDy_all[d * wx:(d + 1) * wx]
        MDz = MDz_all[d * wx:(d + 1) * wx]
        out_ref[d:d + 1, :] = jnp.sum(Wx * M, axis=0, keepdims=True)
        out_ref[3 + 3 * d:4 + 3 * d, :] = jnp.sum(WxD * M, 0, keepdims=True)
        out_ref[4 + 3 * d:5 + 3 * d, :] = jnp.sum(Wx * MDy, 0, keepdims=True)
        out_ref[5 + 3 * d:6 + 3 * d, :] = jnp.sum(Wx * MDz, 0, keepdims=True)
    out_ref[12:16, :] = jnp.zeros_like(out_ref[12:16, :])


def _p2g_bwd_kernel(wx_ref, wxd_ref, wy_ref, wdy_ref, wz_ref, wdz_ref,
                    chan_ref, do1_ref, dmom_ref,
                    dwx_ref, dwxd_ref, dwy_ref, dwdy_ref, dwz_ref, dwdz_ref,
                    dchan_ref, h_ref, t_ref):
    """VJP of _p2g_kernel. do1 = [dgm | dgmom] (wy*wz, 4*wx); dmom = dgmom.

    Every H-slab is rebuilt in VMEM (h_ref) and every H-cotangent slab lives
    only in VMEM (t_ref) — the backward's HBM traffic is the same ~190
    floats/particle as the forward's."""
    Wx, WxD = wx_ref[:], wxd_ref[:]
    Wy, WDy = wy_ref[:], wdy_ref[:]
    Wz, WDz = wz_ref[:], wdz_ref[:]
    chan = chan_ref[:]
    do1 = do1_ref[:]                              # (wy*wz, 4*wx)
    dmom = dmom_ref[:]                            # (wy*wz, 3*wx)
    wx = Wx.shape[0]
    n_y, n_z = Wy.shape[0], Wz.shape[0]

    # ---- R blocks (rebuilt, cheap) ----
    def r_h_block(d):
        if d < 0:
            return Wx * chan[0:1, :]
        return Wx * chan[1 + d:2 + d, :] + WxD * chan[4 + 3 * d:5 + 3 * d, :]

    # ---- dH-path: T = do @ R -> reduce into dWy/dWz families ----
    # dH   = do1 @ R_H   (H = Wy (x) Wz)
    # dHDy = dmom @ R_Dy (HDy = WDy (x) Wz)
    # dHDz = dmom @ R_Dz (HDz = Wy (x) WDz)
    r_all = jnp.concatenate([r_h_block(-1)] + [r_h_block(d) for d in range(3)],
                            axis=0)               # (4*wx, T)
    t_ref[:] = _dot_rows_bwd(do1, r_all)              # dH
    dwz = jnp.zeros_like(Wz)
    for y in range(n_y):
        blk = t_ref[y * n_z:(y + 1) * n_z, :]
        dwy_ref[y:y + 1, :] = jnp.sum(Wz * blk, 0, keepdims=True)
        dwz = dwz + Wy[y:y + 1, :] * blk

    r_dy = jnp.concatenate(
        [Wx * chan[5 + 3 * d:6 + 3 * d, :] for d in range(3)], axis=0)
    t_ref[:] = _dot_rows_bwd(dmom, r_dy)              # dHDy
    for y in range(n_y):
        blk = t_ref[y * n_z:(y + 1) * n_z, :]
        dwdy_ref[y:y + 1, :] = jnp.sum(Wz * blk, 0, keepdims=True)
        dwz = dwz + WDy[y:y + 1, :] * blk
    dwz_ref[:] = dwz

    r_dz = jnp.concatenate(
        [Wx * chan[6 + 3 * d:7 + 3 * d, :] for d in range(3)], axis=0)
    t_ref[:] = _dot_rows_bwd(dmom, r_dz)              # dHDz
    dwdz = jnp.zeros_like(WDz)
    for y in range(n_y):
        blk = t_ref[y * n_z:(y + 1) * n_z, :]
        dwy_ref[y:y + 1, :] += jnp.sum(WDz * blk, 0, keepdims=True)
        dwdz = dwdz + Wy[y:y + 1, :] * blk
    dwdz_ref[:] = dwdz

    # ---- dR-path: dR = H^T-contract do -> dWx/dWxD/dchan ----
    for y in range(n_y):
        h_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * Wz
    dr_h = _dot00_bwd(do1, h_ref[:])                  # (4*wx, T)
    dwx = chan[0:1, :] * dr_h[0:wx, :]
    dwxd = jnp.zeros_like(WxD)
    for d in range(3):
        blk = dr_h[(1 + d) * wx:(2 + d) * wx, :]
        dwx = dwx + chan[1 + d:2 + d, :] * blk
        dwxd = dwxd + chan[4 + 3 * d:5 + 3 * d, :] * blk
        dchan_ref[1 + d:2 + d, :] = jnp.sum(Wx * blk, 0, keepdims=True)
        dchan_ref[4 + 3 * d:5 + 3 * d, :] = jnp.sum(WxD * blk, 0,
                                                    keepdims=True)
    dchan_ref[0:1, :] = jnp.sum(Wx * dr_h[0:wx, :], 0, keepdims=True)

    for y in range(n_y):
        h_ref[y * n_z:(y + 1) * n_z, :] = WDy[y:y + 1, :] * Wz
    dr_dy = _dot00_bwd(dmom, h_ref[:])                # (3*wx, T)
    for d in range(3):
        blk = dr_dy[d * wx:(d + 1) * wx, :]
        dwx = dwx + chan[5 + 3 * d:6 + 3 * d, :] * blk
        dchan_ref[5 + 3 * d:6 + 3 * d, :] = jnp.sum(Wx * blk, 0,
                                                    keepdims=True)

    for y in range(n_y):
        h_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * WDz
    dr_dz = _dot00_bwd(dmom, h_ref[:])
    for d in range(3):
        blk = dr_dz[d * wx:(d + 1) * wx, :]
        dwx = dwx + chan[6 + 3 * d:7 + 3 * d, :] * blk
        dchan_ref[6 + 3 * d:7 + 3 * d, :] = jnp.sum(Wx * blk, 0,
                                                    keepdims=True)
    dwx_ref[:] = dwx
    dwxd_ref[:] = dwxd
    dchan_ref[13:16, :] = jnp.zeros_like(dchan_ref[13:16, :])


def _g2p_bwd_kernel(wx_ref, wxd_ref, wy_ref, wdy_ref, wz_ref, wdz_ref,
                    gvp_ref, g_ref,
                    dwx_ref, dwxd_ref, dwy_ref, dwdy_ref, dwz_ref, dwdz_ref,
                    dgvp_ref,
                    h_ref, hdy_ref, hdz_ref,
                    dh_ref, dhdy_ref, dhdz_ref):
    """VJP of _g2p_kernel. g (16, T) = cotangents of [v(3), m_dj(9), pad].
    H slabs and their cotangent slabs live only in VMEM scratch; the grid
    cotangent accumulates PACKED (wy*wz, 3*wx) so the dot_t contractions
    run 120-wide. The dH-slab cotangents reuse the same packed R matrices:
    dH = Sum_d A_d*dv_d + B_d*dm0_d = gvp @ [Wx*dv_d + WxD*dm0_d]_d — one
    120-wide dot per slab instead of six 40-wide dots plus twelve
    slab-sized VPU FMAs."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        dgvp_ref[:] = jnp.zeros_like(dgvp_ref)

    Wx, WxD = wx_ref[:], wxd_ref[:]
    Wy, WDy = wy_ref[:], wdy_ref[:]
    Wz, WDz = wz_ref[:], wdz_ref[:]
    g = g_ref[:]
    wx = Wx.shape[0]
    n_y, n_z = Wy.shape[0], Wz.shape[0]

    for y in range(n_y):
        h_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * Wz
        hdy_ref[y * n_z:(y + 1) * n_z, :] = WDy[y:y + 1, :] * Wz
        hdz_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * WDz
    H, HDy, HDz = h_ref[:], hdy_ref[:], hdz_ref[:]

    # dA/dB never materialize: their contractions against gv reduce to the
    # small M matrices (dot00 over the 512 H rows, MXU, batched 120-wide via
    # the packed grid), and their contractions against Wx/WxD become
    # dot_t(H-variant, small rhs) with the three channels' rhs stacked.
    gvp = gvp_ref[:]
    M_all = _dot00_bwd(gvp, H)                        # (3*wx, T)
    MDy_all = _dot00_bwd(gvp, HDy)
    MDz_all = _dot00_bwd(gvp, HDz)
    dwx = jnp.zeros_like(Wx)
    dwxd = jnp.zeros_like(WxD)
    r_h = []
    r_dy = []
    r_dz = []
    for d in range(3):
        dv = g[d:d + 1, :]
        dm0 = g[3 + 3 * d:4 + 3 * d, :]
        dm1 = g[4 + 3 * d:5 + 3 * d, :]
        dm2 = g[5 + 3 * d:6 + 3 * d, :]
        M = M_all[d * wx:(d + 1) * wx]
        dwx = dwx + dv * M + dm1 * MDy_all[d * wx:(d + 1) * wx] \
            + dm2 * MDz_all[d * wx:(d + 1) * wx]
        dwxd = dwxd + dm0 * M
        r_h.append(Wx * dv + WxD * dm0)
        r_dy.append(Wx * dm1)
        r_dz.append(Wx * dm2)
    dwx_ref[:] = dwx
    dwxd_ref[:] = dwxd
    rh = jnp.concatenate(r_h, axis=0)             # (3*wx, T)
    rdy = jnp.concatenate(r_dy, axis=0)
    rdz = jnp.concatenate(r_dz, axis=0)
    dgvp_ref[:] += _dot_t_bwd(H, rh) + _dot_t_bwd(HDy, rdy) + _dot_t_bwd(HDz, rdz)

    dh_ref[:] = _dot_rows_bwd(gvp, rh)                # 120-wide, replaces the
    dhdy_ref[:] = _dot_rows_bwd(gvp, rdy)             # per-channel A/B slabs
    dhdz_ref[:] = _dot_rows_bwd(gvp, rdz)

    dwz = jnp.zeros_like(Wz)
    dwdz = jnp.zeros_like(WDz)
    for y in range(n_y):
        blk = dh_ref[y * n_z:(y + 1) * n_z, :]
        blk_dz = dhdz_ref[y * n_z:(y + 1) * n_z, :]
        dwy_ref[y:y + 1, :] = (jnp.sum(Wz * blk, 0, keepdims=True)
                               + jnp.sum(WDz * blk_dz, 0, keepdims=True))
        dwz = dwz + Wy[y:y + 1, :] * blk
        dwdz = dwdz + Wy[y:y + 1, :] * blk_dz
        blk_dy = dhdy_ref[y * n_z:(y + 1) * n_z, :]
        dwdy_ref[y:y + 1, :] = jnp.sum(Wz * blk_dy, 0, keepdims=True)
        dwz = dwz + WDy[y:y + 1, :] * blk_dy
    dwz_ref[:] = dwz
    dwdz_ref[:] = dwdz


def _splat_kernel(wx_ref, wy_ref, wz_ref, vals_ref, out_ref, h_ref, r_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
    Wx, Wy, Wz = wx_ref[:], wy_ref[:], wz_ref[:]
    vals = vals_ref[:]                            # (8, T): rows 0-2 used
    wx = Wx.shape[0]
    n_y, n_z = Wy.shape[0], Wz.shape[0]
    for d in range(3):
        r_ref[d * wx:(d + 1) * wx, :] = Wx * vals[d:d + 1, :]
    for y in range(n_y):
        h_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * Wz
    out_ref[:] += _dot_t(h_ref[:], r_ref[:])


def _gather_kernel(wx_ref, wy_ref, wz_ref, gvp_ref, out_ref, h_ref):
    Wx, Wy, Wz = wx_ref[:], wy_ref[:], wz_ref[:]
    wx = Wx.shape[0]
    n_y, n_z = Wy.shape[0], Wz.shape[0]
    for y in range(n_y):
        h_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * Wz
    H = h_ref[:]
    M_all = _dot00(gvp_ref[:], H)                 # (3*wx, T), 120-wide dot
    for d in range(3):
        M = M_all[d * wx:(d + 1) * wx]
        out_ref[d:d + 1, :] = jnp.sum(Wx * M, axis=0, keepdims=True)
    out_ref[3:8, :] = jnp.zeros_like(out_ref[3:8, :])


def _splat_bwd_kernel(wx_ref, wy_ref, wz_ref, vals_ref, doutp_ref,
                      dwx_ref, dwy_ref, dwz_ref, dvals_ref,
                      h_ref, dh_ref):
    """VJP of _splat_kernel. doutp: the grid cotangent packed (wy*wz, 3*wx)
    so both the N contraction and the dH slab run as 120-wide dots:
    dH = Sum_d A'_d*vals_d = doutp @ [Wx*vals_d]_d."""
    Wx, Wy, Wz = wx_ref[:], wy_ref[:], wz_ref[:]
    vals = vals_ref[:]
    wx = Wx.shape[0]
    n_y, n_z = Wy.shape[0], Wz.shape[0]

    for y in range(n_y):
        h_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * Wz
    H = h_ref[:]

    doutp = doutp_ref[:]
    dwx = jnp.zeros_like(Wx)
    rv = []
    N_all = _dot00_bwd(doutp, H)                      # (3*wx, T), 120-wide dot
    for d in range(3):
        N = N_all[wx * d:wx * (d + 1)]
        dvals_ref[d:d + 1, :] = jnp.sum(Wx * N, 0, keepdims=True)
        dwx = dwx + vals[d:d + 1, :] * N
        rv.append(Wx * vals[d:d + 1, :])
    dh_ref[:] = _dot_rows_bwd(doutp, jnp.concatenate(rv, axis=0))
    dwx_ref[:] = dwx
    dvals_ref[3:8, :] = jnp.zeros_like(dvals_ref[3:8, :])

    dwz = jnp.zeros_like(Wz)
    for y in range(n_y):
        blk = dh_ref[y * n_z:(y + 1) * n_z, :]
        dwy_ref[y:y + 1, :] = jnp.sum(Wz * blk, 0, keepdims=True)
        dwz = dwz + Wy[y:y + 1, :] * blk
    dwz_ref[:] = dwz


def _gather_bwd_kernel(wx_ref, wy_ref, wz_ref, gvp_ref, dv_ref,
                       dwx_ref, dwy_ref, dwz_ref, dgvp_ref,
                       h_ref, dh_ref):
    """VJP of _gather_kernel. dv (8, T), rows 0-2 used; grid cotangent
    accumulates packed (wy*wz, 3*wx) for the batched 120-wide dot. The dH
    slab is the same packed contraction: dH = Sum_d A_d*dv_d
    = gvp @ [Wx*dv_d]_d — and that R matrix is shared with the dgvp dot."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        dgvp_ref[:] = jnp.zeros_like(dgvp_ref)

    Wx, Wy, Wz = wx_ref[:], wy_ref[:], wz_ref[:]
    dv = dv_ref[:]
    wx = Wx.shape[0]
    n_y, n_z = Wy.shape[0], Wz.shape[0]

    for y in range(n_y):
        h_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * Wz
    H = h_ref[:]

    gvp = gvp_ref[:]
    M_all = _dot00_bwd(gvp, H)                        # (3*wx, T)
    dwx = jnp.zeros_like(Wx)
    r_all = []
    for d in range(3):
        dvd = dv[d:d + 1, :]
        r_all.append(Wx * dvd)                    # dA_d = H*dv_d, folded
        dwx = dwx + dvd * M_all[d * wx:(d + 1) * wx]
    rcat = jnp.concatenate(r_all, axis=0)         # (3*wx, T)
    dgvp_ref[:] += _dot_t_bwd(H, rcat)
    dh_ref[:] = _dot_rows_bwd(gvp, rcat)              # 120-wide dH slab
    dwx_ref[:] = dwx

    dwz = jnp.zeros_like(Wz)
    for y in range(n_y):
        blk = dh_ref[y * n_z:(y + 1) * n_z, :]
        dwy_ref[y:y + 1, :] = jnp.sum(Wz * blk, 0, keepdims=True)
        dwz = dwz + Wy[y:y + 1, :] * blk
    dwz_ref[:] = dwz


def _pick_tile(scratch_rows, cap=_TILE_N):
    """Largest 128-multiple tile (<= cap) whose f32 scratch slabs fit a
    ~10 MB budget (the 16 MB scoped-vmem limit minus in/out blocks and
    expression temporaries). The pour window (wy*wz=512) keeps full-width
    tiles; taco's 1152-row window scales down instead of OOMing."""
    tile = (10_000_000 // (4 * scratch_rows)) // 128 * 128
    return int(max(256, min(cap, tile)))


def _pad_tiles(arrs, n, tile=_TILE_N):
    n_pad = -(-n // tile) * tile
    if n_pad == n:
        return arrs, n_pad
    return [jnp.pad(a, ((0, 0), (0, n_pad - n))) for a in arrs], n_pad


def _p2g_pallas(Wx, WxD, Wy, WDy, Wz, WDz, chan):
    wx, n = Wx.shape
    wy, wz = Wy.shape[0], Wz.shape[0]
    tile = _pick_tile(wy * wz + 4 * wx)
    (Wx, WxD, Wy, WDy, Wz, WDz, chan), n_pad = _pad_tiles(
        [Wx, WxD, Wy, WDy, Wz, WDz, chan], n, tile)

    def spec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def out_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    o1, o2, o3 = pl.pallas_call(
        _p2g_kernel,
        grid=(n_pad // tile,),
        in_specs=[spec(wx), spec(wx), spec(wy), spec(wy), spec(wz), spec(wz),
                  spec(16)],
        out_specs=[out_spec((wy * wz, 4 * wx)), out_spec((wy * wz, 3 * wx)),
                   out_spec((wy * wz, 3 * wx))],
        out_shape=[jax.ShapeDtypeStruct((wy * wz, 4 * wx), jnp.float32),
                   jax.ShapeDtypeStruct((wy * wz, 3 * wx), jnp.float32),
                   jax.ShapeDtypeStruct((wy * wz, 3 * wx), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((wy * wz, tile), jnp.float32),
                        pltpu.VMEM((4 * wx, tile), jnp.float32)],
        interpret=_INTERPRET,
    )(Wx, WxD, Wy, WDy, Wz, WDz, chan)
    gm = o1[:, :wx]
    gmom = o1[:, wx:] + o2 + o3
    return gm, gmom


def _g2p_pallas(Wx, WxD, Wy, WDy, Wz, WDz, gv0, gv1, gv2):
    wx, n = Wx.shape
    wy, wz = Wy.shape[0], Wz.shape[0]
    tile = _pick_tile(3 * wy * wz)
    (Wx, WxD, Wy, WDy, Wz, WDz), n_pad = _pad_tiles(
        [Wx, WxD, Wy, WDy, Wz, WDz], n, tile)

    def spec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    gvp = jnp.concatenate([gv0, gv1, gv2], axis=1)
    out = pl.pallas_call(
        _g2p_kernel,
        grid=(n_pad // tile,),
        in_specs=[spec(wx), spec(wx), spec(wy), spec(wy), spec(wz), spec(wz),
                  pl.BlockSpec((wy * wz, 3 * wx), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((wy * wz, tile), jnp.float32),
                        pltpu.VMEM((wy * wz, tile), jnp.float32),
                        pltpu.VMEM((wy * wz, tile), jnp.float32)],
        interpret=_INTERPRET,
    )(Wx, WxD, Wy, WDy, Wz, WDz, gvp)
    return out[:, :n]


def _splat_pallas(Wx, Wy, Wz, vals):
    wx, n = Wx.shape
    wy, wz = Wy.shape[0], Wz.shape[0]
    tile = _pick_tile(wy * wz + 3 * wx)
    vals8 = jnp.concatenate([vals, jnp.zeros((5, n), vals.dtype)], axis=0)
    (Wx, Wy, Wz, vals8), n_pad = _pad_tiles([Wx, Wy, Wz, vals8], n, tile)

    def spec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _splat_kernel,
        grid=(n_pad // tile,),
        in_specs=[spec(wx), spec(wy), spec(wz), spec(8)],
        out_specs=pl.BlockSpec((wy * wz, 3 * wx), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((wy * wz, 3 * wx), jnp.float32),
        scratch_shapes=[pltpu.VMEM((wy * wz, tile), jnp.float32),
                        pltpu.VMEM((3 * wx, tile), jnp.float32)],
        interpret=_INTERPRET,
    )(Wx, Wy, Wz, vals8)
    return out


def _gather_pallas(Wx, Wy, Wz, gv0, gv1, gv2):
    wx, n = Wx.shape
    wy, wz = Wy.shape[0], Wz.shape[0]
    tile = _pick_tile(wy * wz)
    (Wx, Wy, Wz), n_pad = _pad_tiles([Wx, Wy, Wz], n, tile)

    def spec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    gvp = jnp.concatenate([gv0, gv1, gv2], axis=1)
    out = pl.pallas_call(
        _gather_kernel,
        grid=(n_pad // tile,),
        in_specs=[spec(wx), spec(wy), spec(wz),
                  pl.BlockSpec((wy * wz, 3 * wx), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((wy * wz, tile), jnp.float32)],
        interpret=_INTERPRET,
    )(Wx, Wy, Wz, gvp)
    return out[0:3, :n]


def _p2g_bwd_pallas(Wx, WxD, Wy, WDy, Wz, WDz, chan, dgm, dgmom):
    wx, n = Wx.shape
    wy, wz = Wy.shape[0], Wz.shape[0]
    tile = _pick_tile(2 * wy * wz)
    do1 = jnp.concatenate([dgm, dgmom], axis=1)
    (Wx, WxD, Wy, WDy, Wz, WDz, chan), n_pad = _pad_tiles(
        [Wx, WxD, Wy, WDy, Wz, WDz, chan], n, tile)

    def spec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    def out(rows):
        return jax.ShapeDtypeStruct((rows, n_pad), jnp.float32)

    outs = pl.pallas_call(
        _p2g_bwd_kernel,
        grid=(n_pad // tile,),
        in_specs=[spec(wx), spec(wx), spec(wy), spec(wy), spec(wz), spec(wz),
                  spec(16), const((wy * wz, 4 * wx)), const((wy * wz, 3 * wx))],
        out_specs=[spec(wx), spec(wx), spec(wy), spec(wy), spec(wz), spec(wz),
                   spec(16)],
        out_shape=[out(wx), out(wx), out(wy), out(wy), out(wz), out(wz),
                   out(16)],
        scratch_shapes=[pltpu.VMEM((wy * wz, tile), jnp.float32),
                        pltpu.VMEM((wy * wz, tile), jnp.float32)],
        interpret=_INTERPRET,
    )(Wx, WxD, Wy, WDy, Wz, WDz, chan, do1, dgmom)
    return tuple(o[:, :n] for o in outs)


def _g2p_bwd_pallas(Wx, WxD, Wy, WDy, Wz, WDz, gv0, gv1, gv2, g):
    wx, n = Wx.shape
    wy, wz = Wy.shape[0], Wz.shape[0]
    # 6 VMEM slab scratches — the tightest kernel; _pick_tile keeps the
    # slabs inside the 16 MB scoped-vmem budget at every window geometry
    tile = _pick_tile(6 * wy * wz, cap=768)
    (Wx, WxD, Wy, WDy, Wz, WDz, g), n_pad = _pad_tiles(
        [Wx, WxD, Wy, WDy, Wz, WDz, g], n, tile)

    def spec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def out(rows):
        return jax.ShapeDtypeStruct((rows, n_pad), jnp.float32)

    pspec = pl.BlockSpec((wy * wz, 3 * wx), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    slab = pltpu.VMEM((wy * wz, tile), jnp.float32)
    gvp = jnp.concatenate([gv0, gv1, gv2], axis=1)
    outs = pl.pallas_call(
        _g2p_bwd_kernel,
        grid=(n_pad // tile,),
        in_specs=[spec(wx), spec(wx), spec(wy), spec(wy), spec(wz), spec(wz),
                  pspec, spec(16)],
        out_specs=[spec(wx), spec(wx), spec(wy), spec(wy), spec(wz), spec(wz),
                   pspec],
        out_shape=[out(wx), out(wx), out(wy), out(wy), out(wz), out(wz),
                   jax.ShapeDtypeStruct((wy * wz, 3 * wx), jnp.float32)],
        scratch_shapes=[slab] * 6,
        interpret=_INTERPRET,
    )(Wx, WxD, Wy, WDy, Wz, WDz, gvp, g)
    dws = tuple(o[:, :n] for o in outs[:6])
    dgvp = outs[6]
    return dws + (dgvp[:, :wx], dgvp[:, wx:2 * wx], dgvp[:, 2 * wx:])


def _splat_bwd_pallas(Wx, Wy, Wz, vals, dout):
    wx, n = Wx.shape
    wy, wz = Wy.shape[0], Wz.shape[0]
    tile = _pick_tile(2 * wy * wz)
    vals8 = jnp.concatenate([vals, jnp.zeros((5, n), vals.dtype)], axis=0)
    (Wx, Wy, Wz, vals8), n_pad = _pad_tiles([Wx, Wy, Wz, vals8], n, tile)

    def spec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def out(rows):
        return jax.ShapeDtypeStruct((rows, n_pad), jnp.float32)

    pspec = pl.BlockSpec((wy * wz, 3 * wx), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    slab = pltpu.VMEM((wy * wz, tile), jnp.float32)
    dwx, dwy, dwz, dvals = pl.pallas_call(
        _splat_bwd_kernel,
        grid=(n_pad // tile,),
        in_specs=[spec(wx), spec(wy), spec(wz), spec(8), pspec],
        out_specs=[spec(wx), spec(wy), spec(wz), spec(8)],
        out_shape=[out(wx), out(wy), out(wz), out(8)],
        scratch_shapes=[slab, slab],
        interpret=_INTERPRET,
    )(Wx, Wy, Wz, vals8, dout)
    return (dwx[:, :n], dwy[:, :n], dwz[:, :n], dvals[0:3, :n])


def _gather_bwd_pallas(Wx, Wy, Wz, gv0, gv1, gv2, dv):
    wx, n = Wx.shape
    wy, wz = Wy.shape[0], Wz.shape[0]
    tile = _pick_tile(2 * wy * wz)
    dv8 = jnp.concatenate([dv, jnp.zeros((5, n), dv.dtype)], axis=0)
    (Wx, Wy, Wz, dv8), n_pad = _pad_tiles([Wx, Wy, Wz, dv8], n, tile)

    def spec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def out(rows):
        return jax.ShapeDtypeStruct((rows, n_pad), jnp.float32)

    pspec = pl.BlockSpec((wy * wz, 3 * wx), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    slab = pltpu.VMEM((wy * wz, tile), jnp.float32)
    gvp = jnp.concatenate([gv0, gv1, gv2], axis=1)
    dwx, dwy, dwz, dgvp = pl.pallas_call(
        _gather_bwd_kernel,
        grid=(n_pad // tile,),
        in_specs=[spec(wx), spec(wy), spec(wz), pspec, spec(8)],
        out_specs=[spec(wx), spec(wy), spec(wz), pspec],
        out_shape=[out(wx), out(wy), out(wz),
                   jax.ShapeDtypeStruct((wy * wz, 3 * wx), jnp.float32)],
        scratch_shapes=[slab, slab],
        interpret=_INTERPRET,
    )(Wx, Wy, Wz, gvp, dv8)
    return (dwx[:, :n], dwy[:, :n], dwz[:, :n],
            dgvp[:, :wx], dgvp[:, wx:2 * wx], dgvp[:, 2 * wx:])


# ---------------------------------------------------------------------------
# custom_vjp wrappers. Every backward runs in a dedicated fused kernel with
# the same VMEM-resident H slabs as its forward — no H-shaped HBM traffic
# anywhere in the transfer stack.
# ---------------------------------------------------------------------------

@jax.custom_vjp
def p2g(Wx, WxD, Wy, WDy, Wz, WDz, chan):
    """Fused P2G: (gm (wy*wz, wx), gmom (wy*wz, 3*wx))."""
    return _p2g_pallas(Wx, WxD, Wy, WDy, Wz, WDz, chan)


def _p2g_fwd(*args):
    return p2g(*args), args


def _p2g_bwd(res, g):
    dgm, dgmom = g
    return _p2g_bwd_pallas(*res, dgm, dgmom)


p2g.defvjp(_p2g_fwd, _p2g_bwd)


@jax.custom_vjp
def g2p(Wx, WxD, Wy, WDy, Wz, WDz, gv0, gv1, gv2):
    """Fused G2P: (16, N) particle rows [v(3), m_dj(9), pad(4)]."""
    return _g2p_pallas(Wx, WxD, Wy, WDy, Wz, WDz, gv0, gv1, gv2)


def _g2p_fwd(*args):
    return g2p(*args), args


def _g2p_bwd(res, g):
    return _g2p_bwd_pallas(*res, g)


g2p.defvjp(_g2p_fwd, _g2p_bwd)


@jax.custom_vjp
def splat(Wx, Wy, Wz, vals):
    """Fused plain-channel splat: vals (3, N) -> grid (wy*wz, 3*wx)."""
    return _splat_pallas(Wx, Wy, Wz, vals)


def _splat_fwd(*args):
    return splat(*args), args


def _splat_bwd(res, g):
    Wx, Wy, Wz, vals = res
    return _splat_bwd_pallas(Wx, Wy, Wz, vals, g)


splat.defvjp(_splat_fwd, _splat_bwd)


@jax.custom_vjp
def gather(Wx, Wy, Wz, gv0, gv1, gv2):
    """Fused velocity gather: 3 grid channels (wy*wz, wx) -> (3, N)."""
    return _gather_pallas(Wx, Wy, Wz, gv0, gv1, gv2)


def _gather_fwd(*args):
    return gather(*args), args


def _gather_bwd(res, g):
    return _gather_bwd_pallas(*res, g)


gather.defvjp(_gather_fwd, _gather_bwd)


def kernel_wanted(sizes) -> bool:
    """True when the fused transfer kernels may be offered to
    ``lax.platform_dependent`` for this window. Opt-out via
    SOFTMAC_TPU_NO_FUSED_KERNEL."""
    if not _HAS_PALLAS or os.environ.get("SOFTMAC_TPU_NO_FUSED_KERNEL"):
        return False
    wx, wy, wz = int(sizes[0]), int(sizes[1]), int(sizes[2])
    # sublane-aligned rows; VMEM budget ~3 slabs of (wy*wz, 512) f32
    return (wz % 8 == 0 and wy * wz <= 1280 and wx % 8 == 0)
