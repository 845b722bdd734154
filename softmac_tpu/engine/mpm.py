"""MLS-MPM core: one fused, differentiable substep (TPU-native, dense).

Reference semantics: ``softmac/engine/mpm_simulator.py`` — compute_F_tmp(:126),
p2g(:199), grid_op(:284), boundary_condition(:269), g2p(:300), and the
forecast-based mixed-contact pipeline grid_op_mixed1..4(:396-443). The whole
substep is a single pure function intended to run inside a jitted
``lax.scan``; the reference's hand-written per-kernel adjoints (substep_grad,
backward_svd, the 4-way kernel split "for a 10x backward speedup") are
subsumed by ``jax.grad`` + remat.

TPU-native design (what replaces the reference's atomic scatter/gather CUDA
kernels): per-index scatter/gather on TPU costs ~7 ns/element, so the
B-spline transfers are reformulated as dense MXU contractions:

- per-axis weight matrices W_d (ng, N) and derivative variants WD_d with the
  (offset - fx) factor — built by elementwise compare, zero elsewhere;
- P2G: grid[(y,z), x*ch] = Hyz @ R^T where Hyz[(y,z),p] = Wy*Wz is the
  Khatri-Rao pair and R stacks Wx- (and WxD-) weighted value channels. One
  matmul splats every channel, including the affine @ dpos momentum terms
  (dpos separates into the three WD variants);
- G2P: M_d[p, x] = (Hyz-variant)^T @ grid_d, then v/C are (N, ng) row
  reductions against Wx/WxD — intermediates are (N, ng), i.e. ~1 MB.

The particle axis always sits in the TPU lane dimension ((3,N)/(3,3,N) state,
component-form math via ops/m33.py) — see the layout notes there.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from softmac_tpu.engine import contact as contact_mod
from softmac_tpu.engine.materials import compute_stress_and_F, needs_svd
from softmac_tpu.engine.svd3 import svd3_soa
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
from softmac_tpu.ops import m33

OFFSETS = tuple((i, j, k) for i in range(3) for j in range(3) for k in range(3))


# Transfer-matmul precision. The TPU default (single-pass bf16, ~0.3%
# error per op) injects velocity noise every substep and destabilizes the
# cloth solver — never use it here. HIGH (bf16_3x passes, ~1e-6 relative)
# is numerically indistinguishable from f32 for these magnitudes and ~30%
# faster end-to-end than HIGHEST (6 passes) because the backward pass
# doubles the matmul count; validated against the f64 oracle by bench.py's
# tpu_oracle check and the CPU test suite (CPU ignores this setting).
import os as _os
_PRECISION = {
    "default": lax.Precision.DEFAULT,
    "high": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
}[_os.environ.get("SOFTMAC_TPU_MATMUL_PRECISION", "high")]


def _dotT(a, b):
    """Contract the last axis of a with the last axis of b: (A, N)x(B, N)->(A, B)."""
    return lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                           precision=_PRECISION, preferred_element_type=a.dtype)


def _dot0(a, b):
    """Contract axis 0 of a with axis 0 of b: (K, N)x(K, M)->(N, M)."""
    return lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                           precision=_PRECISION, preferred_element_type=a.dtype)


def window_geometry(cfg: MPMConfig, x_vec, axis_name=None):
    """Active-window sizes and (dynamic) corner for this substep.

    Returns (sizes (3 ints), corner (3 traced int32 scalars), overflow bool).
    With no window configured: full grid, corner 0, overflow False.
    With ``axis_name`` (particle-sharded execution) the corner is the global
    min/max over all shards so every chip builds the same window.
    """
    ng = cfg.n_grid
    if not cfg.active_window:
        zero = jnp.int32(0)
        return (ng, ng, ng), (zero, zero, zero), jnp.bool_(False)
    sizes = tuple(int(w) for w in cfg.active_window)
    corner = []
    out = jnp.zeros_like(x_vec[0], dtype=bool)
    for d in range(3):
        # integer outputs only — stop_gradient so autodiff never differentiates
        # through mean/pmean here (the corner is a discrete re-indexing)
        pos = lax.stop_gradient(x_vec[d] * cfg.inv_dx - 0.5)
        # centroid-centered corner: a min/max corner lets a single ejected
        # outlier drag the window off the main blob, silently zeroing EVERY
        # particle's weights (observed on the door scene: one slam froze the
        # whole sim). With the centroid, outliers only freeze themselves —
        # and are reported via the overflow flag.
        center = jnp.mean(pos)
        if axis_name is not None:
            center = lax.pmean(center, axis_name)
        c = jnp.clip(jnp.round(center).astype(jnp.int32) - sizes[d] // 2,
                     0, ng - sizes[d])
        # per-particle coverage: stencil rows base..base+2 must lie inside
        # [c, c+size-1]; overflow on EITHER side zeroes that particle's
        # weights (mass silently vanishes from the transfer), so report both
        base = jnp.floor(pos).astype(jnp.int32)
        out = out | (base < c) | (base + 2 > c + sizes[d] - 1)
        corner.append(c)
    overflow = jnp.any(out)
    if axis_name is not None:
        overflow = lax.pmax(overflow.astype(jnp.int32), axis_name) > 0
    return sizes, tuple(corner), overflow


def axis_weights(cfg: MPMConfig, x_vec, sizes=None, corner=None):
    """Dense per-axis B-spline weight matrices over the active window.

    Returns (W, WD): lists of 3 arrays (w_d, N) each. W[d][r, p] is the
    weight of particle p on window row r along axis d; WD[d] carries the
    extra (offset - fx) factor (unscaled — multiply by dx for P2G's dpos).
    (The chunked-kernel path never calls this — it rebuilds all weights
    inside the kernels from the scaled position rows.)"""
    ng = cfg.n_grid
    if sizes is None:
        sizes = (ng, ng, ng)
        corner = (jnp.int32(0),) * 3
    W, WD = [], []
    for d in range(3):
        r = corner[d] + jnp.arange(sizes[d], dtype=jnp.int32)[:, None]
        pos = x_vec[d] * cfg.inv_dx
        b = jnp.floor(pos - 0.5).astype(jnp.int32)
        fx = pos - b.astype(pos.dtype)
        w = (0.5 * (1.5 - fx) ** 2, 0.75 - (fx - 1.0) ** 2, 0.5 * (fx - 0.5) ** 2)
        Wd = jnp.zeros((sizes[d], x_vec[d].shape[0]), pos.dtype)
        WDd = jnp.zeros_like(Wd)
        for o in range(3):
            hit = r == (b[None, :] + o)
            Wd = Wd + jnp.where(hit, w[o][None, :], 0.0)
            WDd = WDd + jnp.where(hit, (w[o] * (o - fx))[None, :], 0.0)
        W.append(Wd)
        WD.append(WDd)
    return W, WD


def hyz_family(cfg: MPMConfig, W, WD):
    """The three Khatri-Rao (y,z) pair matrices, (wy*wz, N) each.

    On TPU (f32) the build runs as a Pallas streaming kernel (see
    ops/pallas_kr.py). Selection uses ``lax.platform_dependent`` so the SAME
    traced program lowers to the kernel on TPU and the XLA build elsewhere —
    a default-backend check would pick the kernel for programs that execute
    on virtual CPU meshes (the multichip dry run) and fail to lower."""
    wy, wz = W[1].shape[0], W[2].shape[0]

    def xla_build(Wy, Wz, WDy, WDz):
        def pair(a, b):
            return (a[:, None, :] * b[None, :, :]).reshape(wy * wz, -1)
        return pair(Wy, Wz), pair(WDy, Wz), pair(Wy, WDz)

    from softmac_tpu.ops import pallas_kr
    if pallas_kr.kernel_wanted() and W[1].dtype == jnp.float32:
        return lax.platform_dependent(
            W[1], W[2], WD[1], WD[2],
            tpu=pallas_kr.kr3, default=xla_build)
    return xla_build(W[1], W[2], WD[1], WD[2])


def sorted_transfers_wanted(cfg: MPMConfig, dtype) -> bool:
    """Static decision: run the rollout with a SORTED-CARRY — particles ride
    the whole differentiated rollout sorted by their B-spline base y-cell
    (sorted once at rollout entry, re-keyed at block boundaries, unsorted
    once at exit; see env._build_rollout). The fused kernels' particle tiles
    then span a narrow y range, which the chunked kernel variants exploit
    with per-tile 16-row y-windows (half the H-slab work). Physics is
    permutation-invariant (P2G sums reorder at f32 roundoff only); every
    external consumer (losses, state IO, render) sees the original order.

    Measured (scripts/diag_sort_cost.py): permuting per env step INSIDE the
    remat'd step costs ~45 ms/step at 1e5 particles — the gathers themselves
    microbench at ~1 ms, the rest is the interaction with jax.checkpoint's
    replay + scan buffering — hence the once-per-block design."""
    return (_fused_transfer_wanted(cfg, dtype)
            and not _os.environ.get("SOFTMAC_TPU_NO_SORT"))


def auto_chunk_tile(n_particles: int) -> int:
    """Largest safe chunked-kernel tile for a scene (VERDICT r3 #5 —
    replaces the hand-carried SOFTMAC_TPU_TILE_C pins in bench/demos).

    The safety contract is the chunked kernels' 16-row y-window: a tile's
    sorted particles must span <= 6 grid rows (pallas_chunked.chunk_meta).
    At >= 20k particles, >= 1000 particles share each occupied grid row,
    so 2048-wide tiles span ~1 row even after the blob spreads (flagship
    measurement: 2048 beats 1536 by ~9%). Below that, 2048 tiles have been
    observed to overflow mid-rollout as 5-10k-particle blobs spread —
    1536 is the round-3 demo-validated safe point. Init-state spans do NOT
    separate the two regimes (pour measures span 4 at both widths), so the
    rule is calibrated empirically and the runtime window_overflow flag
    remains the enforced contract either way."""
    return 2048 if n_particles >= 20_000 else 1536


def sort_perm(cfg: MPMConfig, x_vec):
    """(perm, inv): permutation sorting particles by base y-cell, and its
    inverse. Gradients flow through the gathers that apply the permutation;
    the sort key itself is discrete (stop_gradient)."""
    pos = lax.stop_gradient(x_vec[1] * cfg.inv_dx)
    key = jnp.floor(pos - 0.5).astype(jnp.int32)
    perm = jnp.argsort(key)
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=perm.dtype))
    return perm, inv


def permute_state(state: MPMState, perm) -> MPMState:
    return MPMState(x=state.x[:, perm], v=state.v[:, perm],
                    C=state.C[:, :, perm], F=state.F[:, :, perm])


def permute_params(params: MPMParams, perm) -> MPMParams:
    return params.replace(
        mu=params.mu[perm], lam=params.lam[perm],
        yield_stress=params.yield_stress[perm],
        control_idx=params.control_idx[perm])


def _fused_transfer_wanted(cfg: MPMConfig, dtype) -> bool:
    """Static decision: route the B-spline transfers through the fully-fused
    Pallas kernels (ops/pallas_fused.py). Requires f32, an active window with
    sublane-aligned sizes, and pallas present. The actual TPU-vs-other choice
    happens per lowering platform via ``lax.platform_dependent`` so the same
    traced program also runs on virtual CPU meshes (multichip dry run)."""
    if dtype != jnp.float32 or not cfg.active_window:
        return False
    from softmac_tpu.ops import pallas_fused
    return pallas_fused.kernel_wanted(cfg.active_window)


def _chunked_transfer_wanted(cfg: MPMConfig, dtype) -> bool:
    """Static decision: upgrade the fused transfers to the y-chunked family
    (ops/pallas_chunked.py) when the window is tall enough to profit
    (wy >= 24). Only consulted when the caller asserts sorted particle
    order (substep's ``assume_sorted``) — the chunked kernels truncate each
    tile to a 16-row y-window, valid only over y-sorted particles."""
    from softmac_tpu.ops import pallas_chunked
    return (pallas_chunked.kernel_wanted(cfg.active_window)
            and not _os.environ.get("SOFTMAC_TPU_NO_CHUNKED"))


def _p2g_channels(cfg: MPMConfig, v_vec, C, stress, impulse):
    """Pack the 13 per-particle P2G scalars (mass, momentum, dx-scaled
    affine) into the fused kernel's (16, N) channel block. Same math as the
    p2g_dense prologue."""
    from softmac_tpu.ops import pallas_fused
    stress_coef = -cfg.dt * cfg.p_vol * 4.0 * cfg.inv_dx * cfg.inv_dx
    affine = m33.madd(m33.mscale(stress, stress_coef), m33.mscale(C, cfg.p_mass))
    affine_dx = m33.mscale(affine, cfg.dx)
    mom = tuple(cfg.p_mass * v_vec[d] + impulse[d] for d in range(3))
    mass = jnp.full_like(v_vec[0], cfg.p_mass)
    return pallas_fused.pack_channels(mass, mom, affine_dx)


def p2g_dense(cfg: MPMConfig, W, WD, Hyz, HyzDy, HyzDz, v_vec, C, stress, impulse):
    """Dense P2G. Returns grid channels (mass, mom x/y/z), each (wy*wz, wx)."""
    ng = W[0].shape[0]
    n = v_vec[0].shape[0]
    dtype = v_vec[0].dtype

    stress_coef = -cfg.dt * cfg.p_vol * 4.0 * cfg.inv_dx * cfg.inv_dx
    affine = m33.madd(m33.mscale(stress, stress_coef), m33.mscale(C, cfg.p_mass))
    mom = tuple(cfg.p_mass * v_vec[d] + impulse[d] for d in range(3))
    mass = jnp.full((n,), cfg.p_mass, dtype)

    Wx, WxD = W[0], WD[0]
    dx = cfg.dx

    # R1: [mass, mom0..2] on Wx + x-direction affine terms on WxD
    r1 = jnp.concatenate([
        Wx * mass[None, :],
        Wx * mom[0][None, :], Wx * mom[1][None, :], Wx * mom[2][None, :],
        WxD * (dx * affine[0][0])[None, :],
        WxD * (dx * affine[1][0])[None, :],
        WxD * (dx * affine[2][0])[None, :],
    ], axis=0)                                     # (7*ng, N)
    out1 = _dotT(Hyz, r1)                          # (ng^2, 7*ng)

    r2 = jnp.concatenate([
        Wx * (dx * affine[0][1])[None, :],
        Wx * (dx * affine[1][1])[None, :],
        Wx * (dx * affine[2][1])[None, :],
    ], axis=0)
    out2 = _dotT(HyzDy, r2)                        # (ng^2, 3*ng)

    r3 = jnp.concatenate([
        Wx * (dx * affine[0][2])[None, :],
        Wx * (dx * affine[1][2])[None, :],
        Wx * (dx * affine[2][2])[None, :],
    ], axis=0)
    out3 = _dotT(HyzDz, r3)

    gm = out1[:, 0:ng]
    gmom = tuple(
        out1[:, (1 + d) * ng:(2 + d) * ng]
        + out1[:, (4 + d) * ng:(5 + d) * ng]
        + out2[:, d * ng:(d + 1) * ng]
        + out3[:, d * ng:(d + 1) * ng]
        for d in range(3)
    )
    return (gm,) + gmom


def splat_channels(cfg: MPMConfig, W, Hyz, values):
    """Dense splat of plain per-particle channels (no affine): values is a
    list of (N,) arrays -> list of (wy*wz, wx) grids. (grid_op_mixed4's
    correction scatter uses this.)"""
    ng = W[0].shape[0]
    Wx = W[0]
    r = jnp.concatenate([Wx * v[None, :] for v in values], axis=0)
    out = _dotT(Hyz, r)
    return [out[:, i * ng:(i + 1) * ng] for i in range(len(values))]


def g2p_dense(cfg: MPMConfig, W, WD, Hyz, HyzDy, HyzDz, grid_v, x_vec):
    """Dense G2P: weighted gather of grid velocity + affine C reconstruction.
    grid_v: 3 channels (ng^2, ng). Returns (v_new, C_new, x_new) tuples."""
    Wx, WxD = W[0], WD[0]
    WxT, WxDT = Wx.T, WxD.T                       # (N, ng) views

    v_new, C_rows = [], [[None] * 3 for _ in range(3)]
    for d in range(3):
        M = _dot0(Hyz, grid_v[d])                  # (N, ng)
        My = _dot0(HyzDy, grid_v[d])
        Mz = _dot0(HyzDz, grid_v[d])
        v_new.append(jnp.sum(M * WxT, axis=1))
        C_rows[d][0] = (4.0 * cfg.inv_dx) * jnp.sum(M * WxDT, axis=1)
        C_rows[d][1] = (4.0 * cfg.inv_dx) * jnp.sum(My * WxT, axis=1)
        C_rows[d][2] = (4.0 * cfg.inv_dx) * jnp.sum(Mz * WxT, axis=1)

    x_new = tuple(x_vec[d] + cfg.dt * v_new[d] for d in range(3))
    return tuple(v_new), tuple(tuple(r) for r in C_rows), x_new


def gather_dense(cfg: MPMConfig, W, Hyz, grid_v):
    """Weighted gather only (grid_op_mixed2): particle-interpolated velocity."""
    WxT = W[0].T
    return tuple(
        jnp.sum(_dot0(Hyz, grid_v[d]) * WxT, axis=1) for d in range(3)
    )


def grid_coords(cfg: MPMConfig, sizes=None, corner=None):
    """Global cell coordinates of the (wy*wz, wx) window grid form."""
    ng = cfg.n_grid
    if sizes is None:
        sizes = (ng, ng, ng)
        corner = (jnp.int32(0),) * 3
    wx, wy, wz = sizes
    row = jnp.arange(wy * wz, dtype=jnp.int32)[:, None]
    y = corner[1] + row // wz
    z = corner[2] + row % wz
    x = corner[0] + jnp.arange(wx, dtype=jnp.int32)[None, :]
    return x, y, z


def boundary_condition(cfg: MPMConfig, coords, gv):
    """Box boundary + sticky ground (mpm_simulator.py:269-281)."""
    bound = 3
    ng = cfg.n_grid
    x, y, z = coords  # broadcastable to (ng^2, ng)
    axes = (x, y, z)
    out = []
    for d in range(3):
        v = gv[d]
        v = jnp.where((axes[d] < bound) & (v < 0), 0.0, v)
        v = jnp.where((axes[d] > ng - bound) & (v > 0), 0.0, v)
        out.append(v)
    if cfg.ground_friction >= 10.0:
        ground = y < bound
        out = [jnp.where(ground, 0.0, v) for v in out]
    return tuple(out)


def cfl_clamp(cfg: MPMConfig, gv):
    """Optional per-component grid-velocity clamp at
    ``cfl_velocity_clamp * dx / dt`` (off when the factor is inf, the
    default — exact reference parity). MLS-MPM is only valid while a
    particle crosses < 1 cell per substep; beyond that, transport tunnels
    through colliders and thin rigid bodies and blows up (observed on the
    door slam). Clamping the GRID velocity bounds both advection and the
    velocity gradient C, so a transient elastic spike dissipates instead of
    amplifying. Never binds in healthy regimes (cap >> scene speeds)."""
    if not np.isfinite(cfg.cfl_velocity_clamp):
        return gv
    cap = float(cfg.cfl_velocity_clamp) * cfg.dx / cfg.dt
    return tuple(jnp.clip(v, -cap, cap) for v in gv)


def grid_normalize(cfg: MPMConfig, grid, gravity):
    """Momentum -> velocity + gravity on non-empty cells."""
    m = grid[0]
    mask = m > 1e-10
    m_safe = jnp.where(mask, m, 1.0)
    gv = tuple(
        jnp.where(mask, grid[d + 1] / m_safe + cfg.dt * gravity[d], 0.0)
        for d in range(3)
    )
    return gv, mask, m


class _Transfers:
    """One substep's B-spline transfer dispatch, shared by ``substep`` and
    ``substep_cloth``: dense XLA matmuls / fused Pallas kernels / y-chunked
    Pallas kernels (the production sorted-carry path). The static
    dense→fused→chunked selection happens here once per substep trace;
    the TPU-vs-other lowering choice rides ``lax.platform_dependent`` in
    each method so the same traced program also runs on virtual CPU meshes
    (the multichip dry run)."""

    def __init__(self, cfg: MPMConfig, x, dtype, assume_sorted, axis_name):
        self.cfg = cfg
        self.x = x
        sizes, corner, overflow = window_geometry(cfg, x, axis_name)
        self.sizes, self.corner = sizes, corner
        self.wx = sizes[0]
        use_fused = _fused_transfer_wanted(cfg, dtype)
        self.use_chunked = (use_fused and assume_sorted
                            and _chunked_transfer_wanted(cfg, dtype))
        self.use_fused = use_fused and not self.use_chunked
        if self.use_chunked:
            # y-chunked family: NO weight arrays exist anywhere — the
            # kernels rebuild all three axes' B-spline weights per tile
            # from the scaled position rows (pallas_chunked._waxis).
            from softmac_tpu.ops import pallas_chunked as pc
            self.fam = pc.family(sizes, cfg.chunk_tile or None)
            px, py, pz = (x[d] * cfg.inv_dx for d in range(3))
            self.pxyz = (px, py, pz)
            meta, c_ovf = pc.chunk_meta(py, corner, sizes[1],
                                        cfg.chunk_tile or None)
            if axis_name is not None:
                c_ovf = lax.pmax(c_ovf.astype(jnp.int32), axis_name) > 0
            overflow = overflow | c_ovf
            self.meta = meta
            self.pv = jnp.zeros((8, x[0].shape[0]), dtype) \
                .at[0].set(px).at[1].set(py).at[2].set(pz)
        elif self.use_fused:
            from softmac_tpu.ops import pallas_fused as pf
            self.pf = pf
            W, WD = axis_weights(cfg, x, sizes, corner)
            self.W = W
            self.ws6 = (W[0], WD[0], W[1], WD[1], W[2], WD[2])
        else:
            W, WD = axis_weights(cfg, x, sizes, corner)
            self.W, self.WD = W, WD
            self.Hyz, self.HyzDy, self.HyzDz = hyz_family(cfg, W, WD)
        self.overflow = overflow

    def p2g(self, v, C, stress, impulse):
        """Full P2G splat -> grid channels (mass, mom x/y/z), (wy*wz, wx)."""
        cfg, wx = self.cfg, self.wx
        if self.use_chunked:
            px, py, pz = self.pxyz
            chan = _p2g_channels(cfg, v, C, stress, impulse) \
                .at[13].set(px).at[14].set(py).at[15].set(pz)
            gm, gmom = lax.platform_dependent(
                chan, self.meta, tpu=self.fam.p2g, default=self.fam.p2g_ref)
            return (gm, gmom[:, :wx], gmom[:, wx:2 * wx], gmom[:, 2 * wx:])
        if self.use_fused:
            chan = _p2g_channels(cfg, v, C, stress, impulse)
            gm, gmom = lax.platform_dependent(
                *self.ws6, chan, tpu=self.pf.p2g, default=self.pf._p2g_ref)
            return (gm, gmom[:, :wx], gmom[:, wx:2 * wx], gmom[:, 2 * wx:])
        return p2g_dense(cfg, self.W, self.WD, self.Hyz, self.HyzDy,
                         self.HyzDz, v, C, stress, impulse)

    def gather(self, grid_v):
        """Weighted gather (grid_op_mixed2): particle-interpolated velocity."""
        if self.use_chunked:
            vt = lax.platform_dependent(
                self.pv, *grid_v, self.meta,
                tpu=self.fam.gather, default=self.fam.gather_ref)
            return (vt[0], vt[1], vt[2])
        if self.use_fused:
            vt = lax.platform_dependent(
                self.W[0], self.W[1], self.W[2], *grid_v,
                tpu=self.pf.gather, default=self.pf._gather_ref)
            return (vt[0], vt[1], vt[2])
        return gather_dense(self.cfg, self.W, self.Hyz, grid_v)

    def splat3(self, vals3):
        """Splat 3 plain per-particle channels (grid_op_mixed4's correction
        scatter) -> list of 3 (wy*wz, wx) grids."""
        wx = self.wx
        if self.use_chunked:
            vals = jnp.concatenate(
                [jnp.stack(list(vals3)), self.pv[0:3], self.pv[6:8]],
                axis=0)   # rows 3-5 = px/py/pz
            cg = lax.platform_dependent(
                vals, self.meta,
                tpu=self.fam.splat, default=self.fam.splat_ref)
            return [cg[:, d * wx:(d + 1) * wx] for d in range(3)]
        if self.use_fused:
            cg = lax.platform_dependent(
                self.W[0], self.W[1], self.W[2], jnp.stack(list(vals3)),
                tpu=self.pf.splat, default=self.pf._splat_ref)
            return [cg[:, d * wx:(d + 1) * wx] for d in range(3)]
        return splat_channels(self.cfg, self.W, self.Hyz, list(vals3))

    def g2p(self, grid_v_out):
        """G2P gather + affine C reconstruction + advection."""
        cfg, x = self.cfg, self.x
        if self.use_chunked or self.use_fused:
            if self.use_chunked:
                out16 = lax.platform_dependent(
                    self.pv, *grid_v_out, self.meta,
                    tpu=self.fam.g2p, default=self.fam.g2p_ref)
            else:
                out16 = lax.platform_dependent(
                    *self.ws6, *grid_v_out,
                    tpu=self.pf.g2p, default=self.pf._g2p_ref)
            v_new = (out16[0], out16[1], out16[2])
            s = 4.0 * cfg.inv_dx
            C_new = tuple(tuple(s * out16[3 + 3 * d + j] for j in range(3))
                          for d in range(3))
            x_new = tuple(x[d] + cfg.dt * v_new[d] for d in range(3))
            return v_new, C_new, x_new
        return g2p_dense(cfg, self.W, self.WD, self.Hyz, self.HyzDy,
                         self.HyzDz, grid_v_out, x)


def substep(
    cfg: MPMConfig,
    params: MPMParams,
    prims: Tuple[SDFParams, ...],
    state: MPMState,
    bodies: BodyState,
    k,                      # substep index within the env step (0..substeps-1)
    mpm_action=None,        # (n_controllers, 3) or None
    axis_name=None,         # particle-shard mesh axis (multi-chip execution)
    assume_sorted=False,    # caller asserts y-cell-sorted particle order
):
    """One MLS-MPM substep with contact. Returns (new_state, ext_f (B, 6)).

    With ``axis_name`` the particle arrays (state, per-particle params) are
    shard-local; partial P2G grids, the mixed-mode correction splat, and
    particle-summed contact wrenches are combined with ``psum`` over the
    named mesh axis (grid ops then run replicated). This is the one and only
    substep implementation — multi-chip execution reuses it verbatim.
    """
    dtype = state.x.dtype
    n_prims = len(prims)

    def _psum(t):
        return lax.psum(t, axis_name) if axis_name is not None else t

    x = (state.x[0], state.x[1], state.x[2])
    v = (state.v[0], state.v[1], state.v[2])
    C = tuple(tuple(state.C[i, j] for j in range(3)) for i in range(3))
    F = tuple(tuple(state.F[i, j] for j in range(3)) for i in range(3))

    # --- deformation update + stress --------------------------------------
    F_tmp = m33.mmul(m33.madd_diag(m33.mscale(C, cfg.dt), 1.0), F)
    if needs_svd(cfg):
        U, sig, V = svd3_soa(F_tmp)
    else:
        U = sig = V = None
    stress, F_new = compute_stress_and_F(
        cfg, F_tmp, U, sig, V, params.mu, params.lam, params.yield_stress)

    # --- impulses: particle contact + particle controllers ----------------
    zero = jnp.zeros_like(x[0])
    impulse = (zero, zero, zero)
    wrenches = [jnp.zeros((6,), dtype) for _ in range(max(n_prims, 1))]
    if cfg.collision_type == CONTACT_PARTICLE:
        for i in range(n_prims):
            if not cfg.primitives_contact[i]:
                continue
            imp, wr = contact_mod.collide_particle(
                prims[i], bodies.pos[i], bodies.quat[i], bodies.v[i], bodies.w[i],
                params.friction[i], x, v, cfg.dt, cfg.p_mass)
            impulse = m33.vadd(impulse, imp)
            wrenches[i] = wrenches[i] + _psum(wr)  # particle-partial sums

    if cfg.n_controllers > 0 and mpm_action is not None:
        cidx = params.control_idx
        sel = jnp.clip(cidx, 0, cfg.n_controllers - 1)
        on = cidx >= 0
        impulse = tuple(
            impulse[d] + jnp.where(on, 6e-4 * mpm_action[sel, d] * cfg.dt, 0.0)
            for d in range(3))

    # --- B-spline transfer operators (active window) -------------------------
    tr = _Transfers(cfg, x, dtype, assume_sorted, axis_name)
    overflow = tr.overflow

    # --- P2G ---------------------------------------------------------------
    grid = _psum(tr.p2g(v, C, stress, impulse))

    # --- grid ops + contact --------------------------------------------------
    # (the grid is replicated after the psum: grid-level contact and its
    # wrench are computed identically on every shard — no further psum)
    coords = grid_coords(cfg, tr.sizes, tr.corner)
    g_v, mask, grid_m = grid_normalize(cfg, grid, params.gravity)

    if cfg.collision_type == CONTACT_MIXED:
        grid_v_mixed = boundary_condition(cfg, coords, g_v)
        v_tmp = tr.gather(grid_v_mixed)
        v_tgt = v_tmp
        life = 1.0 / (cfg.substeps - k)
        for i in range(n_prims):
            if not cfg.primitives_contact[i]:
                continue
            v_tgt, wr = contact_mod.collide_mixed(
                prims[i], bodies.pos[i], bodies.quat[i], bodies.v[i], bodies.w[i],
                params.friction[i], params.softness[i],
                x, v_tgt, cfg.p_mass, cfg.dt, life,
                push_cap=cfg.contact_push_velocity_cap)
            wrenches[i] = wrenches[i] + _psum(wr)  # particle-partial sums

        # splat the velocity correction back (grid_op_mixed4, alpha = 2.0)
        alpha = 2.0
        dv = m33.vsub(v_tmp, v_tgt)
        corr = _psum(tr.splat3([-alpha * dv[d] for d in range(3)]))
        grid_v_out = tuple(
            jnp.where(mask, grid_v_mixed[d] + corr[d], 0.0) for d in range(3))
    elif cfg.collision_type == CONTACT_GRID:
        xg, yg, zg = coords
        shape = jnp.broadcast_shapes(g_v[0].shape, xg.shape)
        grid_pos = (
            jnp.broadcast_to(xg.astype(dtype) * cfg.dx, shape),
            jnp.broadcast_to(yg.astype(dtype) * cfg.dx, shape),
            jnp.broadcast_to(zg.astype(dtype) * cfg.dx, shape),
        )
        v_out = g_v  # contact first, boundary after (grid_op :290-296)
        for i in range(n_prims):
            if not cfg.primitives_contact[i]:
                continue
            v_new, wr = contact_mod.collide_grid(
                prims[i], bodies.pos[i], bodies.quat[i], bodies.v[i], bodies.w[i],
                params.friction[i], params.softness[i],
                grid_pos, v_out, cfg.dt, grid_m)
            v_out = tuple(jnp.where(mask, v_new[d], v_out[d]) for d in range(3))
            wrenches[i] = wrenches[i] + wr
        grid_v_out = boundary_condition(cfg, coords, v_out)
        grid_v_out = tuple(jnp.where(mask, grid_v_out[d], 0.0) for d in range(3))
    else:
        grid_v_out = boundary_condition(cfg, coords, g_v)

    grid_v_out = cfl_clamp(cfg, grid_v_out)

    # --- G2P + advection -----------------------------------------------------
    v_new, C_new, x_new = tr.g2p(grid_v_out)

    new_state = MPMState(
        x=jnp.stack(x_new),
        v=jnp.stack(v_new),
        C=m33.to_mat_array(C_new),
        F=m33.to_mat_array(F_new),
    )
    ext_f = jnp.stack(wrenches)
    return new_state, ext_f, {"window_overflow": overflow}


def substep_cloth(
    cfg: MPMConfig,
    params: MPMParams,
    cloth_params,            # ClothContactParams
    state: MPMState,
    cloth_x,                 # (V, 3) forecast cloth vertices for this window
    cloth_v,                 # (V, 3)
    pen,                     # PenetrationState (stop-gradient integer carry)
    k,
    mpm_action=None,
    axis_name=None,          # particle-shard mesh axis (multi-chip execution)
    assume_sorted=False,     # caller asserts y-cell-sorted particle order
):
    """MLS-MPM substep coupled to a triangle-mesh cloth (the soft_cloth
    variant: ``soft_cloth/engine/mpm_simulator.py`` substep with
    grid_op_mixed3 calling the cloth's collide, :418-428).

    Returns (new_state, vertex ext forces (V, 3), aux). With ``axis_name``
    the particle arrays are shard-local; the P2G grid, the correction splat,
    and the particle-summed vertex forces are psum'd (cloth state replicated).
    Transfers ride the same dense/fused/chunked dispatch as the rigid
    substep (``_Transfers``); ``assume_sorted`` engages the y-chunked
    kernel family over the sorted carry (env._build_rollout permutes the
    penetration side-state along with the particle state).
    """
    from softmac_tpu.engine import cloth_contact as cc

    dtype = state.x.dtype
    n_vertices = cloth_x.shape[0]

    def _psum(t):
        return lax.psum(t, axis_name) if axis_name is not None else t

    x = (state.x[0], state.x[1], state.x[2])
    v = (state.v[0], state.v[1], state.v[2])
    C = tuple(tuple(state.C[i, j] for j in range(3)) for i in range(3))
    F = tuple(tuple(state.F[i, j] for j in range(3)) for i in range(3))

    F_tmp = m33.mmul(m33.madd_diag(m33.mscale(C, cfg.dt), 1.0), F)
    if needs_svd(cfg):
        U, sig, V = svd3_soa(F_tmp)
    else:
        U = sig = V = None
    stress, F_new = compute_stress_and_F(
        cfg, F_tmp, U, sig, V, params.mu, params.lam, params.yield_stress)

    zero = jnp.zeros_like(x[0])
    impulse = (zero, zero, zero)
    ext_vertex_f = jnp.zeros((n_vertices, 3), dtype)
    if cfg.collision_type == CONTACT_PARTICLE:
        imp, ext = cc.collide_cloth(
            cloth_params, cloth_x, cloth_v, x, v, cfg.p_mass, cfg.dt, 1.0,
            pen, n_vertices, mode="particle")
        impulse = m33.vadd(impulse, imp)
        ext_vertex_f = ext_vertex_f + _psum(ext)

    if cfg.n_controllers > 0 and mpm_action is not None:
        cidx = params.control_idx
        sel = jnp.clip(cidx, 0, cfg.n_controllers - 1)
        on = cidx >= 0
        impulse = tuple(
            impulse[d] + jnp.where(on, 6e-4 * mpm_action[sel, d] * cfg.dt, 0.0)
            for d in range(3))

    tr = _Transfers(cfg, x, dtype, assume_sorted, axis_name)
    overflow = tr.overflow

    grid = _psum(tr.p2g(v, C, stress, impulse))

    coords = grid_coords(cfg, tr.sizes, tr.corner)
    g_v, mask, grid_m = grid_normalize(cfg, grid, params.gravity)

    if cfg.collision_type == CONTACT_MIXED:
        grid_v_mixed = boundary_condition(cfg, coords, g_v)
        v_tmp = tr.gather(grid_v_mixed)
        life = 1.0 / (cfg.substeps - k)
        v_tgt, ext = cc.collide_cloth(
            cloth_params, cloth_x, cloth_v, x, v_tmp, cfg.p_mass, cfg.dt,
            life, pen, n_vertices, mode="mixed")
        ext_vertex_f = ext_vertex_f + _psum(ext)

        alpha = 2.0
        dv = m33.vsub(v_tmp, v_tgt)
        corr = _psum(tr.splat3([-alpha * dv[d] for d in range(3)]))
        grid_v_out = tuple(
            jnp.where(mask, grid_v_mixed[d] + corr[d], 0.0) for d in range(3))
    else:
        grid_v_out = boundary_condition(cfg, coords, g_v)

    grid_v_out = cfl_clamp(cfg, grid_v_out)

    v_new, C_new, x_new = tr.g2p(grid_v_out)

    new_state = MPMState(
        x=jnp.stack(x_new),
        v=jnp.stack(v_new),
        C=m33.to_mat_array(C_new),
        F=m33.to_mat_array(F_new),
    )
    return new_state, ext_vertex_f, {"window_overflow": overflow}
