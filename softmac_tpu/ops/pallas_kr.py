"""Pallas TPU kernel: the Khatri-Rao (y,z) weight-pair build.

Phase profiling (1e5 particles, window (40,32,16)) puts the *build* of the
three pair matrices Hyz/HyzDy/HyzDz — 3x(wy*wz, N) ~ 615 MB of HBM writes —
at ~4-6 ms of a ~10 ms substep. This kernel streams N in lane tiles and
emits each (y,z) row block with a plain sublane broadcast — no reshape, no
relayout. MEASURED: within noise of the XLA build in isolation (6.32 vs
6.35 ms incl. weight construction) — XLA's lowering is already
bandwidth-bound, not relayout-bound — but the full substep improves ~6%
(10.8 -> 10.1 ms), so the kernel stays as the production path. The real
lever on the build cost is shrinking wy*wz itself (spatially-sorted
chunking), for which this kernel is the natural substrate (per-chunk row
windows slot into the same grid/BlockSpec structure).

Forward-only: the build is wrapped in a custom_vjp whose backward runs the
cheap XLA segment reductions (dWy[y] = sum_z dH[(y,z)] * Wz etc.), identical
to what autodiff of the XLA build produces.

Used by mpm.hyz_family on TPU backends for f32; the XLA path remains the
reference implementation (CPU tests, f64, odd shapes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_TILE_N = 512
_INTERPRET = False   # tests flip this to run the kernel on CPU


def _kernel(wy_ref, wz_ref, wyd_ref, wzd_ref, h_ref, hdy_ref, hdz_ref):
    wy = wy_ref[:]        # (wy, T)
    wz = wz_ref[:]        # (wz, T)
    wyd = wyd_ref[:]
    wzd = wzd_ref[:]
    n_y = wy.shape[0]
    n_z = wz.shape[0]
    for y in range(n_y):
        row = wy[y, :][None, :]       # (1, T) -> sublane broadcast
        rowd = wyd[y, :][None, :]
        h_ref[y * n_z:(y + 1) * n_z, :] = row * wz
        hdy_ref[y * n_z:(y + 1) * n_z, :] = rowd * wz
        hdz_ref[y * n_z:(y + 1) * n_z, :] = row * wzd


def _kr3_fwd_pallas(Wy, Wz, WDy, WDz):
    wy, n = Wy.shape
    wz = Wz.shape[0]
    n_pad = -(-n // _TILE_N) * _TILE_N
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n))
        Wy, Wz = jnp.pad(Wy, pad), jnp.pad(Wz, pad)
        WDy, WDz = jnp.pad(WDy, pad), jnp.pad(WDz, pad)

    grid = (n_pad // _TILE_N,)
    in_spec_y = pl.BlockSpec((wy, _TILE_N), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    in_spec_z = pl.BlockSpec((wz, _TILE_N), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((wy * wz, _TILE_N), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((wy * wz, n_pad), Wy.dtype)
    H, HDy, HDz = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[in_spec_y, in_spec_z, in_spec_y, in_spec_z],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[shape, shape, shape],
        interpret=_INTERPRET,
    )(Wy, Wz, WDy, WDz)
    if n_pad != n:
        H, HDy, HDz = H[:, :n], HDy[:, :n], HDz[:, :n]
    return H, HDy, HDz


@jax.custom_vjp
def kr3(Wy, Wz, WDy, WDz):
    """(Hyz, HyzDy, HyzDz) = (KR(Wy,Wz), KR(WDy,Wz), KR(Wy,WDz)),
    each (wy*wz, N) with row (y, z) = y*wz + z."""
    return _kr3_fwd_pallas(Wy, Wz, WDy, WDz)


def _kr3_fwd(Wy, Wz, WDy, WDz):
    return kr3(Wy, Wz, WDy, WDz), (Wy, Wz, WDy, WDz)


def _kr3_bwd(res, g):
    Wy, Wz, WDy, WDz = res
    wy, n = Wy.shape
    wz = Wz.shape[0]
    dH, dHDy, dHDz = (t.reshape(wy, wz, n) for t in g)
    dWy = jnp.einsum("yzn,zn->yn", dH, Wz) + jnp.einsum(
        "yzn,zn->yn", dHDz, WDz)
    dWz = jnp.einsum("yzn,yn->zn", dH, Wy) + jnp.einsum(
        "yzn,yn->zn", dHDy, WDy)
    dWDy = jnp.einsum("yzn,zn->yn", dHDy, Wz)
    dWDz = jnp.einsum("yzn,yn->zn", dHDz, Wy)
    return dWy, dWz, dWDy, dWDz


kr3.defvjp(_kr3_fwd, _kr3_bwd)


def kernel_wanted() -> bool:
    """True when the Pallas KR build may be offered to
    ``lax.platform_dependent`` (which then only lowers it for TPU targets).
    Opt-out via SOFTMAC_TPU_NO_KR_KERNEL."""
    import os
    return _HAS_PALLAS and not os.environ.get("SOFTMAC_TPU_NO_KR_KERNEL")
