"""KEPT EXPERIMENT (non-production): fused Khatri-Rao splat for P2G.

Measured SLOWER than the XLA dense path (see body docstrings); kept under
scripts/ as a negative-result record. The production splat kernels live in
softmac_tpu/ops/pallas_chunked.py.

The XLA formulation materializes the Khatri-Rao pair matrices
Hyz[(y,z), p] = Wy[y,p]*Wz[z,p] (and two derivative variants) in HBM —
~200 MB each at 1e5 particles — before the MXU contraction. This kernel
builds each Hyz *tile* in VMEM on the fly and accumulates all three
contractions into a VMEM-resident output block across particle tiles:

    out[(y,z), 0:R1] += (Wy ⊛ Wz)   @ R1^T
    out[(y,z), R1:+R2] += (WyD ⊛ Wz) @ R2^T
    out[(y,z), R2:+R3] += (Wy ⊛ WzD) @ R3^T

Grid: one program per particle tile; the output block stays in VMEM and is
accumulated (revisited) by every program. The backward pass reuses the XLA
dense formulation via custom_vjp.

STATUS: measured SLOWER than the XLA dense formulation (4.3 vs 3.7 ms/iter
at 1e5 particles, window (48,32,16)) — the in-kernel Khatri-Rao build
(broadcast + (wy,wz,P)->(wy*wz,P) reshape) costs Mosaic relayouts that
exceed the HBM traffic it saves, and Mosaic's dot defaults to bf16 passes
(rel err ~2e-4 vs the f32 XLA path). Kept as a documented experiment; the
production path is mpm.p2g_dense. A competitive kernel needs a layout that
avoids the cross-sublane reshape (e.g. processing one y-row block per
program with the z-axis in sublanes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _kernel(wy_ref, wz_ref, wyd_ref, wzd_ref, r1_ref, r2_ref, r3_ref, out_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    wy = wy_ref[:]            # (wy, P)
    wz = wz_ref[:]            # (wz, P)
    wyd = wyd_ref[:]
    wzd = wzd_ref[:]
    n_y, P = wy.shape
    n_z = wz.shape[0]

    def kr(a, b):
        # (wy, P) x (wz, P) -> (wy*wz, P) Khatri-Rao tile, built in VMEM
        return (a[:, None, :] * b[None, :, :]).reshape(n_y * n_z, P)

    r1 = r1_ref[:]            # (c1, P)
    r2 = r2_ref[:]
    r3 = r3_ref[:]
    c1 = r1.shape[0]
    c2 = r2.shape[0]

    def dotT(h, r):
        return lax.dot_general(h, r, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)

    out_ref[:, 0:c1] = out_ref[:, 0:c1] + dotT(kr(wy, wz), r1)
    out_ref[:, c1:c1 + c2] = out_ref[:, c1:c1 + c2] + dotT(kr(wyd, wz), r2)
    out_ref[:, c1 + c2:] = out_ref[:, c1 + c2:] + dotT(kr(wy, wzd), r3)


def _pad_particles(arrs, P):
    n = arrs[0].shape[1]
    pad = (-n) % P
    if pad == 0:
        return arrs, n
    return [jnp.pad(a, ((0, 0), (0, pad))) for a in arrs], n


def splat_fused_fwd(Wy, Wz, WyD, WzD, R1, R2, R3, tile_p: int = 512):
    """Forward fused splat. Returns (wy*wz, c1+c2+c3) f32."""
    (Wy, Wz, WyD, WzD, R1, R2, R3), n = _pad_particles(
        [Wy, Wz, WyD, WzD, R1, R2, R3], tile_p)
    n_pad = Wy.shape[1]
    n_tiles = n_pad // tile_p
    wy, wz = Wy.shape[0], Wz.shape[0]
    c1, c2, c3 = R1.shape[0], R2.shape[0], R3.shape[0]

    def tile_spec(rows):
        return pl.BlockSpec((rows, tile_p), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[tile_spec(wy), tile_spec(wz), tile_spec(wy), tile_spec(wz),
                  tile_spec(c1), tile_spec(c2), tile_spec(c3)],
        out_specs=pl.BlockSpec((wy * wz, c1 + c2 + c3), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((wy * wz, c1 + c2 + c3), jnp.float32),
    )(Wy, Wz, WyD, WzD, R1, R2, R3)
    return out


def _xla_reference(Wy, Wz, WyD, WzD, R1, R2, R3):
    """The materializing XLA formulation (also the backward implementation)."""
    wy, wz = Wy.shape[0], Wz.shape[0]

    def kr(a, b):
        return (a[:, None, :] * b[None, :, :]).reshape(wy * wz, -1)

    def dotT(a, b):
        return lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               precision=lax.Precision.HIGHEST,
                               preferred_element_type=a.dtype)

    return jnp.concatenate(
        [dotT(kr(Wy, Wz), R1), dotT(kr(WyD, Wz), R2), dotT(kr(Wy, WzD), R3)],
        axis=1)


@jax.custom_vjp
def splat_fused(Wy, Wz, WyD, WzD, R1, R2, R3):
    """Fused Khatri-Rao splat with pallas forward / XLA-dense backward."""
    return splat_fused_fwd(Wy, Wz, WyD, WzD, R1, R2, R3)


def _fwd(Wy, Wz, WyD, WzD, R1, R2, R3):
    return splat_fused_fwd(Wy, Wz, WyD, WzD, R1, R2, R3), (
        Wy, Wz, WyD, WzD, R1, R2, R3)


def _bwd(res, g):
    return jax.vjp(_xla_reference, *res)[1](g)


splat_fused.defvjp(_fwd, _bwd)


def available() -> bool:
    return _HAS_PALLAS and jax.default_backend() == "tpu"
