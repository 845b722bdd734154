"""Pallas TPU kernels: y-chunked B-spline transfers over sorted particles.

The fully-fused kernels (ops/pallas_fused.py) contract dense
(wy*wz, T) H-slabs although each particle's quadratic stencil touches only
3x3 (y, z) cells — at the pour window (wy=32, wz=16) ~98% of the slab work
multiplies zeros. With particles sorted by base y-cell (mpm.sort_perm, run
once per env step) a 1536-particle tile spans only 1-3 y-cells, so each
tile can work in a 16-row y-window positioned per tile:

- per-tile metadata (chunk_meta, plain XLA): window offset o(t) — a
  multiple of 8 covering every stencil row of the tile — as grid-BLOCK
  index o8 = o/8, a first-visit flag, and the absolute offset cy + o the
  in-kernel weight builder needs. Recomputed every substep from current
  positions, so intra-step drift self-corrects; a tile whose span exceeds
  the window raises the overflow flag (same contract as the active
  window itself, mpm.window_geometry).
- the y-axis weights (16, T) are built IN the kernel from the scaled
  position row (``_wy16``) — identical math to mpm.axis_weights — so no
  (wy, N) Wy/WDy arrays exist anywhere, and the backward kernels map the
  weight cotangents straight to a position-row cotangent with a trace-time
  ``jax.vjp`` of the same builder.
- grid-shaped operands are accessed through per-tile DYNAMIC 8-row blocks
  (pltpu.PrefetchScalarGridSpec): each kernel touches two adjacent y-blocks
  (A at o8, B at o8+1). Grid-accumulating OUTPUTS use a separate HBM array
  per block ref (A-array + B-array, summed and visit-masked in XLA
  afterward): the sorted tile order visits each (ref, block) pair in one
  contiguous run, so zero-on-first-visit accumulation is race-free — a
  single aliased array would let ref A's write-back clobber ref B's earlier
  partial sums.

H-slab shapes drop from (wy*wz, T) to (16*wz, T); at the pour window that
halves the slab builds, the MXU contraction depth, and the per-y reduction
loops of every kernel.

Reference semantics: softmac/engine/mpm_simulator.py p2g(:199) / g2p(:300),
same as pallas_fused — verified against the dense path (and transitively
the NumPy f64 oracle) by tests/test_pallas_chunked.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from softmac_tpu.ops.pallas_fused import (
    _dot_t, _dot_rows, _dot00, _dot_t_bwd, _dot_rows_bwd, _dot00_bwd,
)
from softmac_tpu.ops import pallas_fused as _pf

import os as _os

# one tile width for the whole chunked family -> one meta. 1536 was tuned
# at wx=40 (round 2); env override for sweeps (scripts/diag_tile.py).
_TILE_C = int(_os.environ.get("SOFTMAC_TPU_TILE_C", "1536"))
_WY = 16           # per-tile y-window rows (2 grid blocks of 8)


def kernel_wanted(window) -> bool:
    """Chunked kernels need pallas, a window with wy >= 24 (else the full
    dense kernels are already optimal) and sublane-aligned wy/wz."""
    if not _HAS_PALLAS or not window:
        return False
    wx, wy, wz = window
    return wy >= 24 and wy % 8 == 0 and wz % 8 == 0


# ---------------------------------------------------------------------------
# Per-tile window metadata (plain XLA; runs every substep).
# ---------------------------------------------------------------------------

def chunk_meta(py, corner, wy, tile=None):
    """py: (N,) scaled y positions (x[1] * inv_dx); corner: the 3 traced
    int32 window corners (cx, cy, cz). Returns (meta (6, n_tiles) int32,
    overflow bool).

    meta rows: [o8 (window offset in 8-row blocks), first-visit flag,
    cy + o (absolute y row offset for the in-kernel weight builder),
    o, cx, cz (x/z corners for the in-kernel x/z weight builders —
    constant across tiles, broadcast so everything rides one SMEM block)].
    """
    tile = _TILE_C if tile is None else tile
    cx, cy, cz = corner
    n = py.shape[0]
    n_pad = -(-n // tile) * tile
    base = jnp.floor(lax.stop_gradient(py) - 0.5).astype(jnp.int32) - cy
    base = jnp.pad(base, (0, n_pad - n))
    valid = (jnp.arange(n_pad) < n).reshape(-1, tile)
    b2 = base.reshape(-1, tile)
    bmin = jnp.min(jnp.where(valid, b2, 10 ** 6), axis=1)
    bmax = jnp.max(jnp.where(valid, b2, -10 ** 6), axis=1)
    o = jnp.clip((bmin // 8) * 8, 0, wy - _WY)
    overflow = jnp.any((bmax + 2 > o + _WY - 1) | (bmin < o))
    o8 = o // 8
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (o8[1:] != o8[:-1]).astype(jnp.int32)])
    meta = jnp.stack([o8, first, cy + o, o,
                      jnp.broadcast_to(cx, o8.shape),
                      jnp.broadcast_to(cz, o8.shape)])
    return meta, overflow


# ---------------------------------------------------------------------------
# In-kernel y-axis weight builder (identical math to mpm.axis_weights).
# ---------------------------------------------------------------------------

def _waxis(p, c, w):
    """Quadratic B-spline weight rows from scaled positions, in-kernel:
    p: (1, T) scaled positions (pos * inv_dx); c: 0-d f32 absolute window
    row offset (x/z: the window corner; y: corner + per-tile o). Returns
    (W, WD), each (w, T) — identical math to mpm.axis_weights, so NO
    (w, N) weight array ever exists in HBM and the weight->position
    backprop happens in the backward kernels via jax.vjp of this builder."""
    b = jnp.floor(p - 0.5)
    fx = p - b
    rb = b - c                             # window-local base row (float)
    # Mosaic requires integer iota; cast after (f32 holds small ints exactly)
    r = lax.broadcasted_iota(jnp.int32, (w, p.shape[1]), 0) \
        .astype(jnp.float32)
    wgt = (0.5 * (1.5 - fx) ** 2, 0.75 - (fx - 1.0) ** 2,
           0.5 * (fx - 0.5) ** 2)
    W = jnp.zeros((w, p.shape[1]), jnp.float32)
    WD = jnp.zeros_like(W)
    for o in range(3):
        hit = r == rb + o
        W = W + jnp.where(hit, wgt[o], 0.0)
        WD = WD + jnp.where(hit, wgt[o] * (o - fx), 0.0)
    return W, WD


def _wy16(py, cyo):
    """(Wy, WDy) over the per-tile 16-row y-window."""
    return _waxis(py, cyo, _WY)


def _wy_xla(py, meta, wy, n, tile=None):
    """XLA reference: full (wy, N) window-row Wy/WDy from scaled positions,
    with rows outside each particle's tile window zeroed (the chunked
    kernels' truncation semantics). Derives the window corner and the
    per-particle local offsets from meta alone."""
    cy = (meta[2, 0] - meta[3, 0]).astype(py.dtype)
    tile = _TILE_C if tile is None else int(tile)
    olocal = jnp.repeat(meta[3], tile)[:n].astype(py.dtype)
    b = jnp.floor(py - 0.5)
    fx = py - b
    r = jnp.arange(wy, dtype=py.dtype)[:, None]
    rb = (b - cy)[None, :]
    w = (0.5 * (1.5 - fx) ** 2, 0.75 - (fx - 1.0) ** 2,
         0.5 * (fx - 0.5) ** 2)
    Wy = jnp.zeros((wy, py.shape[0]), py.dtype)
    WDy = jnp.zeros_like(Wy)
    for o in range(3):
        hit = r == rb + o
        Wy = Wy + jnp.where(hit, w[o][None, :], 0.0)
        WDy = WDy + jnp.where(hit, (w[o] * (o - fx))[None, :], 0.0)
    lo = olocal[None, :]
    inwin = (r >= lo) & (r < lo + _WY)
    return jnp.where(inwin, Wy, 0.0), jnp.where(inwin, WDy, 0.0)


def _pad_tile(arrs, n, tile=None):
    tile = _TILE_C if tile is None else tile
    n_pad = -(-n // tile) * tile
    if n_pad == n:
        return arrs, n_pad
    return [jnp.pad(a, ((0, 0), (0, n_pad - n))) for a in arrs], n_pad


def _combine_ab(a, b, meta, wy, wz):
    """Sum the A/B accumulator arrays with per-block visit masks (unvisited
    blocks hold uninitialized memory)."""
    nb = wy // 8
    visa = jnp.zeros((nb,), bool).at[meta[0]].set(True)
    visb = jnp.zeros((nb,), bool).at[meta[0] + 1].set(True)
    ma = jnp.repeat(visa, 8 * wz)[:, None]
    mb = jnp.repeat(visb, 8 * wz)[:, None]
    return jnp.where(ma, a, 0.0) + jnp.where(mb, b, 0.0)


# ---------------------------------------------------------------------------
# Forward kernels.
# ---------------------------------------------------------------------------

def _axes_weights(meta_ref, t, px, py, pz, wx, wz):
    """All six weight blocks, built in-kernel from the three position rows
    + the corner scalars riding in meta."""
    Wx, WxD = _waxis(px, meta_ref[4, t].astype(jnp.float32), wx)
    Wy, WDy = _wy16(py, meta_ref[2, t].astype(jnp.float32))
    Wz, WDz = _waxis(pz, meta_ref[5, t].astype(jnp.float32), wz)
    return Wx, WxD, Wy, WDy, Wz, WDz


def _p2g_c_kernel(meta_ref, chan_ref,
                  o1a_ref, o1b_ref, o2a_ref, o2b_ref, o3a_ref, o3b_ref,
                  h_ref, r_ref):
    """chan rows 0-12: P2G scalars; rows 13/14/15: px/py/pz (scaled)."""
    t = pl.program_id(0)

    @pl.when(meta_ref[1, t] == 1)
    def _():
        for ref in (o1a_ref, o1b_ref, o2a_ref, o2b_ref, o3a_ref, o3b_ref):
            ref[:] = jnp.zeros_like(ref)

    chan = chan_ref[:]
    n_z = o1a_ref.shape[0] // 8
    wx = o1a_ref.shape[1] // 4
    half = (_WY // 2) * n_z
    Wx, WxD, Wy, WDy, Wz, WDz = _axes_weights(
        meta_ref, t, chan[13:14, :], chan[14:15, :], chan[15:16, :], wx, n_z)

    r_ref[0:wx, :] = Wx * chan[0:1, :]
    for d in range(3):
        r_ref[(1 + d) * wx:(2 + d) * wx, :] = (
            Wx * chan[1 + d:2 + d, :] + WxD * chan[4 + 3 * d:5 + 3 * d, :])
    for y in range(_WY):
        h_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * Wz
    o1 = _dot_t(h_ref[:], r_ref[:])
    o1a_ref[:] += o1[:half]
    o1b_ref[:] += o1[half:]

    for d in range(3):
        r_ref[d * wx:(d + 1) * wx, :] = Wx * chan[5 + 3 * d:6 + 3 * d, :]
    for y in range(_WY):
        h_ref[y * n_z:(y + 1) * n_z, :] = WDy[y:y + 1, :] * Wz
    o2 = _dot_t(h_ref[:], r_ref[0:3 * wx, :])
    o2a_ref[:] += o2[:half]
    o2b_ref[:] += o2[half:]

    for d in range(3):
        r_ref[d * wx:(d + 1) * wx, :] = Wx * chan[6 + 3 * d:7 + 3 * d, :]
    for y in range(_WY):
        h_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * WDz
    o3 = _dot_t(h_ref[:], r_ref[0:3 * wx, :])
    o3a_ref[:] += o3[:half]
    o3b_ref[:] += o3[half:]


def _g2p_c_kernel(meta_ref, pv_ref,
                  gvpa_ref, gvpb_ref, out_ref, h_ref, hdy_ref, hdz_ref):
    """pv rows 0/1/2: px/py/pz (scaled positions)."""
    t = pl.program_id(0)
    n_z = gvpa_ref.shape[0] // 8
    wx = gvpa_ref.shape[1] // 3
    Wx, WxD, Wy, WDy, Wz, WDz = _axes_weights(
        meta_ref, t, pv_ref[0:1, :], pv_ref[1:2, :], pv_ref[2:3, :],
        wx, n_z)

    for y in range(_WY):
        h_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * Wz
        hdy_ref[y * n_z:(y + 1) * n_z, :] = WDy[y:y + 1, :] * Wz
        hdz_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * WDz
    H, HDy, HDz = h_ref[:], hdy_ref[:], hdz_ref[:]

    gvp = jnp.concatenate([gvpa_ref[:], gvpb_ref[:]], axis=0)
    M_all = _dot00(gvp, H)                        # (3*wx, T)
    MDy_all = _dot00(gvp, HDy)
    MDz_all = _dot00(gvp, HDz)
    for d in range(3):
        M = M_all[d * wx:(d + 1) * wx]
        MDy = MDy_all[d * wx:(d + 1) * wx]
        MDz = MDz_all[d * wx:(d + 1) * wx]
        out_ref[d:d + 1, :] = jnp.sum(Wx * M, axis=0, keepdims=True)
        out_ref[3 + 3 * d:4 + 3 * d, :] = jnp.sum(WxD * M, 0, keepdims=True)
        out_ref[4 + 3 * d:5 + 3 * d, :] = jnp.sum(Wx * MDy, 0, keepdims=True)
        out_ref[5 + 3 * d:6 + 3 * d, :] = jnp.sum(Wx * MDz, 0, keepdims=True)
    out_ref[12:16, :] = jnp.zeros_like(out_ref[12:16, :])


def _gather_c_kernel(meta_ref, pv_ref, gvpa_ref, gvpb_ref,
                     out_ref, h_ref):
    """pv rows 0/1/2: px/py/pz (scaled positions)."""
    t = pl.program_id(0)
    n_z = gvpa_ref.shape[0] // 8
    wx = gvpa_ref.shape[1] // 3
    Wx, _ = _waxis(pv_ref[0:1, :], meta_ref[4, t].astype(jnp.float32), wx)
    Wy, _ = _wy16(pv_ref[1:2, :], meta_ref[2, t].astype(jnp.float32))
    Wz, _ = _waxis(pv_ref[2:3, :], meta_ref[5, t].astype(jnp.float32), n_z)
    for y in range(_WY):
        h_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * Wz
    gvp = jnp.concatenate([gvpa_ref[:], gvpb_ref[:]], axis=0)
    M_all = _dot00(gvp, h_ref[:])
    for d in range(3):
        M = M_all[d * wx:(d + 1) * wx]
        out_ref[d:d + 1, :] = jnp.sum(Wx * M, axis=0, keepdims=True)
    out_ref[3:8, :] = jnp.zeros_like(out_ref[3:8, :])


def _splat_c_kernel(meta_ref, vals_ref,
                    oa_ref, ob_ref, h_ref, r_ref):
    """vals rows 0-2: channel values; rows 3/4/5: px/py/pz."""
    t = pl.program_id(0)

    @pl.when(meta_ref[1, t] == 1)
    def _():
        oa_ref[:] = jnp.zeros_like(oa_ref)
        ob_ref[:] = jnp.zeros_like(ob_ref)

    vals = vals_ref[:]
    n_z = oa_ref.shape[0] // 8
    wx = oa_ref.shape[1] // 3
    half = (_WY // 2) * n_z
    Wx, _ = _waxis(vals[3:4, :], meta_ref[4, t].astype(jnp.float32), wx)
    Wy, _ = _wy16(vals[4:5, :], meta_ref[2, t].astype(jnp.float32))
    Wz, _ = _waxis(vals[5:6, :], meta_ref[5, t].astype(jnp.float32), n_z)
    for d in range(3):
        r_ref[d * wx:(d + 1) * wx, :] = Wx * vals[d:d + 1, :]
    for y in range(_WY):
        h_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * Wz
    o = _dot_t(h_ref[:], r_ref[:])
    oa_ref[:] += o[:half]
    ob_ref[:] += o[half:]


# ---------------------------------------------------------------------------
# Backward kernels. Same batched-contraction structure as the pallas_fused
# backwards (dH slabs via packed 120-wide dots); the y-weight cotangents map
# to a position-row cotangent through jax.vjp of the in-kernel builder.
# ---------------------------------------------------------------------------

def _vjp_weights(meta_ref, t, px, py, pz, wx, wz):
    """All six weight blocks + the three weight->position vjps."""
    cx = meta_ref[4, t].astype(jnp.float32)
    cyo = meta_ref[2, t].astype(jnp.float32)
    cz = meta_ref[5, t].astype(jnp.float32)
    (Wx, WxD), vjp_x = jax.vjp(lambda p: _waxis(p, cx, wx), px)
    (Wy, WDy), vjp_y = jax.vjp(lambda p: _waxis(p, cyo, _WY), py)
    (Wz, WDz), vjp_z = jax.vjp(lambda p: _waxis(p, cz, wz), pz)
    return (Wx, WxD, Wy, WDy, Wz, WDz), (vjp_x, vjp_y, vjp_z)


def _p2g_c_bwd_kernel(meta_ref, chan_ref,
                      do1a_ref, do1b_ref, dma_ref, dmb_ref,
                      dchan_ref, h_ref, t_ref):
    t = pl.program_id(0)
    chan = chan_ref[:]
    n_z = do1a_ref.shape[0] // 8
    wx = do1a_ref.shape[1] // 4
    (Wx, WxD, Wy, WDy, Wz, WDz), (vjp_x, vjp_y, vjp_z) = _vjp_weights(
        meta_ref, t, chan[13:14, :], chan[14:15, :], chan[15:16, :],
        wx, n_z)
    do1 = jnp.concatenate([do1a_ref[:], do1b_ref[:]], axis=0)
    dmom = jnp.concatenate([dma_ref[:], dmb_ref[:]], axis=0)

    def r_h_block(d):
        if d < 0:
            return Wx * chan[0:1, :]
        return Wx * chan[1 + d:2 + d, :] + WxD * chan[4 + 3 * d:5 + 3 * d, :]

    # dH-path
    r_all = jnp.concatenate([r_h_block(-1)] + [r_h_block(d) for d in range(3)],
                            axis=0)
    t_ref[:] = _dot_rows_bwd(do1, r_all)              # dH
    dwz = jnp.zeros_like(Wz)
    dwy_rows = []                 # (1, T) rows — Mosaic has no scatter, so
    for y in range(_WY):          # build dwy/dwdy by row-concatenation
        blk = t_ref[y * n_z:(y + 1) * n_z, :]
        dwy_rows.append(jnp.sum(Wz * blk, 0, keepdims=True))
        dwz = dwz + Wy[y:y + 1, :] * blk

    r_dy = jnp.concatenate(
        [Wx * chan[5 + 3 * d:6 + 3 * d, :] for d in range(3)], axis=0)
    t_ref[:] = _dot_rows_bwd(dmom, r_dy)              # dHDy
    dwdy_rows = []
    for y in range(_WY):
        blk = t_ref[y * n_z:(y + 1) * n_z, :]
        dwdy_rows.append(jnp.sum(Wz * blk, 0, keepdims=True))
        dwz = dwz + WDy[y:y + 1, :] * blk

    r_dz = jnp.concatenate(
        [Wx * chan[6 + 3 * d:7 + 3 * d, :] for d in range(3)], axis=0)
    t_ref[:] = _dot_rows_bwd(dmom, r_dz)              # dHDz
    dwdz = jnp.zeros_like(WDz)
    for y in range(_WY):
        blk = t_ref[y * n_z:(y + 1) * n_z, :]
        dwy_rows[y] = dwy_rows[y] + jnp.sum(WDz * blk, 0, keepdims=True)
        dwdz = dwdz + Wy[y:y + 1, :] * blk
    dwy = jnp.concatenate(dwy_rows, axis=0)
    dwdy = jnp.concatenate(dwdy_rows, axis=0)

    # dR-path
    for y in range(_WY):
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

    for y in range(_WY):
        h_ref[y * n_z:(y + 1) * n_z, :] = WDy[y:y + 1, :] * Wz
    dr_dy = _dot00_bwd(dmom, h_ref[:])
    for d in range(3):
        blk = dr_dy[d * wx:(d + 1) * wx, :]
        dwx = dwx + chan[5 + 3 * d:6 + 3 * d, :] * blk
        dchan_ref[5 + 3 * d:6 + 3 * d, :] = jnp.sum(Wx * blk, 0,
                                                    keepdims=True)

    for y in range(_WY):
        h_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * WDz
    dr_dz = _dot00_bwd(dmom, h_ref[:])
    for d in range(3):
        blk = dr_dz[d * wx:(d + 1) * wx, :]
        dwx = dwx + chan[6 + 3 * d:7 + 3 * d, :] * blk
        dchan_ref[6 + 3 * d:7 + 3 * d, :] = jnp.sum(Wx * blk, 0,
                                                    keepdims=True)
    # weight cotangents -> scaled-position-row cotangents (chan 13/14/15)
    dpx, = vjp_x((dwx, dwxd))
    dpy, = vjp_y((dwy, dwdy))
    dpz, = vjp_z((dwz, dwdz))
    dchan_ref[13:14, :] = dpx
    dchan_ref[14:15, :] = dpy
    dchan_ref[15:16, :] = dpz


def _g2p_c_bwd_kernel(meta_ref, pv_ref,
                      gvpa_ref, gvpb_ref, g_ref,
                      dpv_ref, dgvpa_ref, dgvpb_ref,
                      h_ref, hdy_ref, hdz_ref):
    t = pl.program_id(0)

    @pl.when(meta_ref[1, t] == 1)
    def _():
        dgvpa_ref[:] = jnp.zeros_like(dgvpa_ref)
        dgvpb_ref[:] = jnp.zeros_like(dgvpb_ref)

    g = g_ref[:]
    n_z = gvpa_ref.shape[0] // 8
    wx = gvpa_ref.shape[1] // 3
    half = (_WY // 2) * n_z
    (Wx, WxD, Wy, WDy, Wz, WDz), (vjp_x, vjp_y, vjp_z) = _vjp_weights(
        meta_ref, t, pv_ref[0:1, :], pv_ref[1:2, :], pv_ref[2:3, :],
        wx, n_z)

    for y in range(_WY):
        h_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * Wz
        hdy_ref[y * n_z:(y + 1) * n_z, :] = WDy[y:y + 1, :] * Wz
        hdz_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * WDz
    H, HDy, HDz = h_ref[:], hdy_ref[:], hdz_ref[:]

    gvp = jnp.concatenate([gvpa_ref[:], gvpb_ref[:]], axis=0)
    M_all = _dot00_bwd(gvp, H)
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
    rh = jnp.concatenate(r_h, axis=0)
    rdy = jnp.concatenate(r_dy, axis=0)
    rdz = jnp.concatenate(r_dz, axis=0)
    dgvp = _dot_t_bwd(H, rh) + _dot_t_bwd(HDy, rdy) + _dot_t_bwd(HDz, rdz)
    dgvpa_ref[:] += dgvp[:half]
    dgvpb_ref[:] += dgvp[half:]

    # the H/HDy/HDz slabs are dead after the dgvp dot: reuse their scratch
    # refs for the dH slabs (halves the kernel's scoped-vmem footprint —
    # 6 slabs blew the 16 MB budget once the bwd dots changed shape)
    h_ref[:] = _dot_rows_bwd(gvp, rh)       # dH
    hdy_ref[:] = _dot_rows_bwd(gvp, rdy)    # dHDy
    hdz_ref[:] = _dot_rows_bwd(gvp, rdz)    # dHDz

    dwz = jnp.zeros_like(Wz)
    dwdz = jnp.zeros_like(WDz)
    dwy_rows, dwdy_rows = [], []  # row-concat (no scatter in Mosaic)
    for y in range(_WY):
        blk = h_ref[y * n_z:(y + 1) * n_z, :]
        blk_dz = hdz_ref[y * n_z:(y + 1) * n_z, :]
        dwy_rows.append(jnp.sum(Wz * blk, 0, keepdims=True)
                        + jnp.sum(WDz * blk_dz, 0, keepdims=True))
        dwz = dwz + Wy[y:y + 1, :] * blk
        dwdz = dwdz + Wy[y:y + 1, :] * blk_dz
        blk_dy = hdy_ref[y * n_z:(y + 1) * n_z, :]
        dwdy_rows.append(jnp.sum(Wz * blk_dy, 0, keepdims=True))
        dwz = dwz + WDy[y:y + 1, :] * blk_dy
    dwy = jnp.concatenate(dwy_rows, axis=0)
    dwdy = jnp.concatenate(dwdy_rows, axis=0)
    dpx, = vjp_x((dwx, dwxd))
    dpy, = vjp_y((dwy, dwdy))
    dpz, = vjp_z((dwz, dwdz))
    dpv_ref[0:1, :] = dpx
    dpv_ref[1:2, :] = dpy
    dpv_ref[2:3, :] = dpz
    dpv_ref[3:8, :] = jnp.zeros_like(dpv_ref[3:8, :])


def _gather_c_bwd_kernel(meta_ref, pv_ref, gvpa_ref,
                         gvpb_ref, dv_ref,
                         dpv_ref, dgvpa_ref, dgvpb_ref,
                         h_ref, dh_ref):
    t = pl.program_id(0)

    @pl.when(meta_ref[1, t] == 1)
    def _():
        dgvpa_ref[:] = jnp.zeros_like(dgvpa_ref)
        dgvpb_ref[:] = jnp.zeros_like(dgvpb_ref)

    dv = dv_ref[:]
    n_z = gvpa_ref.shape[0] // 8
    wx = gvpa_ref.shape[1] // 3
    half = (_WY // 2) * n_z
    (Wx, WxD, Wy, WDy, Wz, WDz), (vjp_x, vjp_y, vjp_z) = _vjp_weights(
        meta_ref, t, pv_ref[0:1, :], pv_ref[1:2, :], pv_ref[2:3, :],
        wx, n_z)

    for y in range(_WY):
        h_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * Wz
    H = h_ref[:]

    gvp = jnp.concatenate([gvpa_ref[:], gvpb_ref[:]], axis=0)
    M_all = _dot00(gvp, H)
    dwx = jnp.zeros_like(Wx)
    r_all = []
    for d in range(3):
        dvd = dv[d:d + 1, :]
        r_all.append(Wx * dvd)
        dwx = dwx + dvd * M_all[d * wx:(d + 1) * wx]
    rcat = jnp.concatenate(r_all, axis=0)
    dgvp = _dot_t(H, rcat)
    dgvpa_ref[:] += dgvp[:half]
    dgvpb_ref[:] += dgvp[half:]
    dh_ref[:] = _dot_rows(gvp, rcat)

    dwz = jnp.zeros_like(Wz)
    dwy_rows = []                 # row-concat (no scatter in Mosaic)
    for y in range(_WY):
        blk = dh_ref[y * n_z:(y + 1) * n_z, :]
        dwy_rows.append(jnp.sum(Wz * blk, 0, keepdims=True))
        dwz = dwz + Wy[y:y + 1, :] * blk
    dpx, = vjp_x((dwx, jnp.zeros_like(WxD)))
    dpy, = vjp_y((jnp.concatenate(dwy_rows, axis=0), jnp.zeros_like(WDy)))
    dpz, = vjp_z((dwz, jnp.zeros_like(WDz)))
    dpv_ref[0:1, :] = dpx
    dpv_ref[1:2, :] = dpy
    dpv_ref[2:3, :] = dpz
    dpv_ref[3:8, :] = jnp.zeros_like(dpv_ref[3:8, :])


def _splat_c_bwd_kernel(meta_ref, vals_ref,
                        dpa_ref, dpb_ref,
                        dvals_ref, h_ref, dh_ref):
    t = pl.program_id(0)
    vals = vals_ref[:]
    n_z = dpa_ref.shape[0] // 8
    wx = dpa_ref.shape[1] // 3
    (Wx, WxD, Wy, WDy, Wz, WDz), (vjp_x, vjp_y, vjp_z) = _vjp_weights(
        meta_ref, t, vals[3:4, :], vals[4:5, :], vals[5:6, :], wx, n_z)

    for y in range(_WY):
        h_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * Wz
    H = h_ref[:]

    doutp = jnp.concatenate([dpa_ref[:], dpb_ref[:]], axis=0)
    dwx = jnp.zeros_like(Wx)
    rv = []
    N_all = _dot00(doutp, H)
    for d in range(3):
        N = N_all[wx * d:wx * (d + 1)]
        dvals_ref[d:d + 1, :] = jnp.sum(Wx * N, 0, keepdims=True)
        dwx = dwx + vals[d:d + 1, :] * N
        rv.append(Wx * vals[d:d + 1, :])
    dh_ref[:] = _dot_rows(doutp, jnp.concatenate(rv, axis=0))

    dwz = jnp.zeros_like(Wz)
    dwy_rows = []                 # row-concat (no scatter in Mosaic)
    for y in range(_WY):
        blk = dh_ref[y * n_z:(y + 1) * n_z, :]
        dwy_rows.append(jnp.sum(Wz * blk, 0, keepdims=True))
        dwz = dwz + Wy[y:y + 1, :] * blk
    dpx, = vjp_x((dwx, jnp.zeros_like(WxD)))
    dpy, = vjp_y((jnp.concatenate(dwy_rows, axis=0), jnp.zeros_like(WDy)))
    dpz, = vjp_z((dwz, jnp.zeros_like(WDz)))
    dvals_ref[3:4, :] = dpx
    dvals_ref[4:5, :] = dpy
    dvals_ref[5:6, :] = dpz
    dvals_ref[6:8, :] = jnp.zeros_like(dvals_ref[6:8, :])


# ---------------------------------------------------------------------------
# pallas_call plumbing (PrefetchScalarGridSpec: meta rides in SMEM, index
# maps place the dynamic grid blocks).
# ---------------------------------------------------------------------------

_INTERPRET = False   # tests flip this to run the kernels on CPU


def _specs(tile, wz, wx):
    def lane(rows):
        return pl.BlockSpec((rows, tile), lambda i, m: (0, i),
                            memory_space=pltpu.VMEM)

    def grid_a(cols):
        return pl.BlockSpec((8 * wz, cols), lambda i, m: (m[0, i], 0),
                            memory_space=pltpu.VMEM)

    def grid_b(cols):
        return pl.BlockSpec((8 * wz, cols), lambda i, m: (m[0, i] + 1, 0),
                            memory_space=pltpu.VMEM)
    return lane, grid_a, grid_b


def _p2g_c_pallas(chan, meta, window, tile=None):
    wx, wy, wz = window
    n = chan.shape[1]
    tile = _TILE_C if tile is None else int(tile)
    (chan,), n_pad = _pad_tile([chan], n, tile)
    lane, grid_a, grid_b = _specs(tile, wz, wx)
    slab = pltpu.VMEM((_WY * wz, tile), jnp.float32)

    def out(cols):
        return jax.ShapeDtypeStruct((wy * wz, cols), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // tile,),
        in_specs=[lane(16)],
        out_specs=[grid_a(4 * wx), grid_b(4 * wx), grid_a(3 * wx),
                   grid_b(3 * wx), grid_a(3 * wx), grid_b(3 * wx)],
        scratch_shapes=[slab, pltpu.VMEM((4 * wx, tile), jnp.float32)],
    )
    o1a, o1b, o2a, o2b, o3a, o3b = pl.pallas_call(
        _p2g_c_kernel,
        grid_spec=grid_spec,
        out_shape=[out(4 * wx), out(4 * wx), out(3 * wx), out(3 * wx),
                   out(3 * wx), out(3 * wx)],
        interpret=_INTERPRET,
    )(meta, chan)
    o1 = _combine_ab(o1a, o1b, meta, wy, wz)
    o2 = _combine_ab(o2a, o2b, meta, wy, wz)
    o3 = _combine_ab(o3a, o3b, meta, wy, wz)
    gm = o1[:, :wx]
    gmom = o1[:, wx:] + o2 + o3
    return gm, gmom


def _p2g_c_bwd_pallas(chan, meta, window, dgm, dgmom, tile=None):
    wx, wy, wz = window
    n = chan.shape[1]
    tile = _TILE_C if tile is None else int(tile)
    (chan,), n_pad = _pad_tile([chan], n, tile)
    lane, grid_a, grid_b = _specs(tile, wz, wx)
    slab = pltpu.VMEM((_WY * wz, tile), jnp.float32)
    do1 = jnp.concatenate([dgm, dgmom], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // tile,),
        in_specs=[lane(16),
                  grid_a(4 * wx), grid_b(4 * wx),
                  grid_a(3 * wx), grid_b(3 * wx)],
        out_specs=[lane(16)],
        scratch_shapes=[slab, slab],
    )
    dchan, = pl.pallas_call(
        _p2g_c_bwd_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((16, n_pad), jnp.float32)],
        interpret=_INTERPRET,
    )(meta, chan, do1, do1, dgmom, dgmom)
    return dchan[:, :n]


def _g2p_c_pallas(pv, gv0, gv1, gv2, meta, window, tile=None):
    wx, wy, wz = window
    n = pv.shape[1]
    tile = _TILE_C if tile is None else int(tile)
    (pv,), n_pad = _pad_tile([pv], n, tile)
    lane, grid_a, grid_b = _specs(tile, wz, wx)
    slab = pltpu.VMEM((_WY * wz, tile), jnp.float32)
    gvp = jnp.concatenate([gv0, gv1, gv2], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // tile,),
        in_specs=[lane(8), grid_a(3 * wx), grid_b(3 * wx)],
        out_specs=lane(16),
        scratch_shapes=[slab, slab, slab],
    )
    out = pl.pallas_call(
        _g2p_c_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, n_pad), jnp.float32),
        interpret=_INTERPRET,
    )(meta, pv, gvp, gvp)
    return out[:, :n]


def _g2p_c_bwd_pallas(pv, gv0, gv1, gv2, meta, window, g, tile=None):
    wx, wy, wz = window
    n = pv.shape[1]
    tile = _TILE_C if tile is None else int(tile)
    (pv, g), n_pad = _pad_tile([pv, g], n, tile)
    lane, grid_a, grid_b = _specs(tile, wz, wx)
    slab = pltpu.VMEM((_WY * wz, tile), jnp.float32)
    gvp = jnp.concatenate([gv0, gv1, gv2], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // tile,),
        in_specs=[lane(8), grid_a(3 * wx), grid_b(3 * wx), lane(16)],
        out_specs=[lane(8), grid_a(3 * wx), grid_b(3 * wx)],
        scratch_shapes=[slab] * 3,
    )
    outs = pl.pallas_call(
        _g2p_c_bwd_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((wy * wz, 3 * wx), jnp.float32),
                   jax.ShapeDtypeStruct((wy * wz, 3 * wx), jnp.float32)],
        interpret=_INTERPRET,
    )(meta, pv, gvp, gvp, g)
    dpv = outs[0][:, :n]
    dgvp = _combine_ab(outs[1], outs[2], meta, wy, wz)
    return (dpv, dgvp[:, :wx], dgvp[:, wx:2 * wx], dgvp[:, 2 * wx:])


def _gather_c_pallas(pv, gv0, gv1, gv2, meta, window, tile=None):
    wx, wy, wz = window
    n = pv.shape[1]
    tile = _TILE_C if tile is None else int(tile)
    (pv,), n_pad = _pad_tile([pv], n, tile)
    lane, grid_a, grid_b = _specs(tile, wz, wx)
    slab = pltpu.VMEM((_WY * wz, tile), jnp.float32)
    gvp = jnp.concatenate([gv0, gv1, gv2], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // tile,),
        in_specs=[lane(8), grid_a(3 * wx), grid_b(3 * wx)],
        out_specs=lane(8),
        scratch_shapes=[slab],
    )
    out = pl.pallas_call(
        _gather_c_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        interpret=_INTERPRET,
    )(meta, pv, gvp, gvp)
    return out[0:3, :n]


def _gather_c_bwd_pallas(pv, gv0, gv1, gv2, meta, window, dv, tile=None):
    wx, wy, wz = window
    n = pv.shape[1]
    tile = _TILE_C if tile is None else int(tile)
    dv8 = jnp.concatenate([dv, jnp.zeros((5, n), dv.dtype)], axis=0)
    (pv, dv8), n_pad = _pad_tile([pv, dv8], n, tile)
    lane, grid_a, grid_b = _specs(tile, wz, wx)
    slab = pltpu.VMEM((_WY * wz, tile), jnp.float32)
    gvp = jnp.concatenate([gv0, gv1, gv2], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // tile,),
        in_specs=[lane(8), grid_a(3 * wx), grid_b(3 * wx), lane(8)],
        out_specs=[lane(8), grid_a(3 * wx), grid_b(3 * wx)],
        scratch_shapes=[slab, slab],
    )
    outs = pl.pallas_call(
        _gather_c_bwd_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((wy * wz, 3 * wx), jnp.float32),
                   jax.ShapeDtypeStruct((wy * wz, 3 * wx), jnp.float32)],
        interpret=_INTERPRET,
    )(meta, pv, gvp, gvp, dv8)
    dpv = outs[0][:, :n]
    dgvp = _combine_ab(outs[1], outs[2], meta, wy, wz)
    return (dpv, dgvp[:, :wx], dgvp[:, wx:2 * wx], dgvp[:, 2 * wx:])


def _splat_c_pallas(vals, meta, window, tile=None):
    wx, wy, wz = window
    n = vals.shape[1]
    tile = _TILE_C if tile is None else int(tile)
    (vals,), n_pad = _pad_tile([vals], n, tile)
    lane, grid_a, grid_b = _specs(tile, wz, wx)
    slab = pltpu.VMEM((_WY * wz, tile), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // tile,),
        in_specs=[lane(8)],
        out_specs=[grid_a(3 * wx), grid_b(3 * wx)],
        scratch_shapes=[slab, pltpu.VMEM((3 * wx, tile), jnp.float32)],
    )
    oa, ob = pl.pallas_call(
        _splat_c_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((wy * wz, 3 * wx), jnp.float32)] * 2,
        interpret=_INTERPRET,
    )(meta, vals)
    return _combine_ab(oa, ob, meta, wy, wz)


def _splat_c_bwd_pallas(vals, meta, window, dout, tile=None):
    wx, wy, wz = window
    n = vals.shape[1]
    tile = _TILE_C if tile is None else int(tile)
    (vals,), n_pad = _pad_tile([vals], n, tile)
    lane, grid_a, grid_b = _specs(tile, wz, wx)
    slab = pltpu.VMEM((_WY * wz, tile), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // tile,),
        in_specs=[lane(8), grid_a(3 * wx), grid_b(3 * wx)],
        out_specs=[lane(8)],
        scratch_shapes=[slab, slab],
    )
    dvals, = pl.pallas_call(
        _splat_c_bwd_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((8, n_pad), jnp.float32)],
        interpret=_INTERPRET,
    )(meta, vals, dout, dout)
    return dvals[:, :n]


# ---------------------------------------------------------------------------
# XLA reference implementations (the ``lax.platform_dependent`` default
# branch and the interpret-test baseline): rebuild the truncated Wy/WDy and
# delegate to the dense pallas_fused references.
# ---------------------------------------------------------------------------

def _ref_family(window, tile=None):
    """XLA references: rebuild all six weight blocks from the position rows
    (x/z via _waxis — plain jnp, runs fine outside kernels; y via the
    truncation-aware _wy_xla) and delegate to the dense pallas_fused refs."""
    wx, wy, wz = window

    def weights(px, py, pz, meta, n):
        Wx, WxD = _waxis(px[None, :], meta[4, 0].astype(jnp.float32), wx)
        Wz, WDz = _waxis(pz[None, :], meta[5, 0].astype(jnp.float32), wz)
        Wy, WDy = _wy_xla(py, meta, wy, n, tile)
        return Wx, WxD, Wy, WDy, Wz, WDz

    def p2g_ref(chan, meta):
        Wx, WxD, Wy, WDy, Wz, WDz = weights(
            chan[13], chan[14], chan[15], meta, chan.shape[1])
        return _pf._p2g_ref(Wx, WxD, Wy, WDy, Wz, WDz, chan)

    def g2p_ref(pv, gv0, gv1, gv2, meta):
        Wx, WxD, Wy, WDy, Wz, WDz = weights(
            pv[0], pv[1], pv[2], meta, pv.shape[1])
        return _pf._g2p_ref(Wx, WxD, Wy, WDy, Wz, WDz, gv0, gv1, gv2)

    def gather_ref(pv, gv0, gv1, gv2, meta):
        Wx, _, Wy, _, Wz, _ = weights(pv[0], pv[1], pv[2], meta, pv.shape[1])
        return _pf._gather_ref(Wx, Wy, Wz, gv0, gv1, gv2)

    def splat_ref(vals, meta):
        Wx, _, Wy, _, Wz, _ = weights(
            vals[3], vals[4], vals[5], meta, vals.shape[1])
        return _pf._splat_ref(Wx, Wy, Wz, vals[0:3])

    return p2g_ref, g2p_ref, gather_ref, splat_ref


# ---------------------------------------------------------------------------
# custom_vjp public entries, one family per static wy. meta is an int32
# operand -> float0 cotangent.
# ---------------------------------------------------------------------------

def _zero_meta(meta):
    return np.zeros(meta.shape, jax.dtypes.float0)


import functools as _functools
import types as _types


@_functools.lru_cache(maxsize=None)
def family(window, tile=None):
    """The four chunked transfer entries for a static window (wx, wy, wz).
    Same output avals as the pallas_fused entries so mpm.substep can pick
    either family per window geometry. ``tile`` overrides the module-level
    particle-tile width (envs resolve it per scene — mpm.auto_chunk_tile);
    it keys the cache alongside the window. All B-spline weights are built
    INSIDE the kernels from the scaled position rows (chan 13-15 / pv 0-2 /
    vals 3-5): no (w, N) weight array exists in HBM, and the backward
    kernels map weight cotangents straight to position-row cotangents."""
    window = tuple(int(w) for w in window)
    tile = _TILE_C if tile is None else int(tile)

    @jax.custom_vjp
    def p2g_c(chan, meta):
        return _p2g_c_pallas(chan, meta, window, tile)

    def _p2g_fwd(*args):
        return p2g_c(*args), args

    def _p2g_bwd(res, g):
        dgm, dgmom = g
        chan, meta = res
        return (_p2g_c_bwd_pallas(chan, meta, window, dgm, dgmom, tile),
                _zero_meta(meta))

    p2g_c.defvjp(_p2g_fwd, _p2g_bwd)

    @jax.custom_vjp
    def g2p_c(pv, gv0, gv1, gv2, meta):
        return _g2p_c_pallas(pv, gv0, gv1, gv2, meta, window, tile)

    def _g2p_fwd(*args):
        return g2p_c(*args), args

    def _g2p_bwd(res, g):
        *ws, meta = res
        return _g2p_c_bwd_pallas(*ws, meta, window, g, tile) + (_zero_meta(meta),)

    g2p_c.defvjp(_g2p_fwd, _g2p_bwd)

    @jax.custom_vjp
    def gather_c(pv, gv0, gv1, gv2, meta):
        return _gather_c_pallas(pv, gv0, gv1, gv2, meta, window, tile)

    def _gather_fwd(*args):
        return gather_c(*args), args

    def _gather_bwd(res, g):
        *ws, meta = res
        return _gather_c_bwd_pallas(*ws, meta, window, g, tile) \
            + (_zero_meta(meta),)

    gather_c.defvjp(_gather_fwd, _gather_bwd)

    @jax.custom_vjp
    def splat_c(vals, meta):
        return _splat_c_pallas(vals, meta, window, tile)

    def _splat_fwd(*args):
        return splat_c(*args), args

    def _splat_bwd(res, g):
        vals, meta = res
        return (_splat_c_bwd_pallas(vals, meta, window, g, tile),
                _zero_meta(meta))

    splat_c.defvjp(_splat_fwd, _splat_bwd)

    p2g_ref, g2p_ref, gather_ref, splat_ref = _ref_family(window, tile)
    return _types.SimpleNamespace(
        p2g=p2g_c, g2p=g2p_c, gather=gather_c, splat=splat_c,
        p2g_ref=p2g_ref, g2p_ref=g2p_ref, gather_ref=gather_ref,
        splat_ref=splat_ref)
