"""Batched differentiable 3x3 SVD in struct-of-arrays form (TPU-native).

Forward: cyclic Jacobi on F^T F with a fixed sweep count — fully elementwise
on (N,)-shaped component arrays, so the whole decomposition fuses into a few
VPU kernels (no (N,3,3) tensors, no dynamic-update-slices; see ops/m33.py for
why that matters on TPU). U is rebuilt from F V via Gram-Schmidt + cross
product, so U, V are in SO(3) and sigma_2 carries the sign of det(F) — the
``ti.svd`` convention the reference's corotated model relies on
(``softmac/engine/mpm_simulator.py:131-134``).

Backward: custom VJP implementing the clamped-denominator rule the reference
hand-codes in ``backward_svd`` (``mpm_simulator.py:140-157``): 1/(s_j - s_i)
clamped away from zero so repeated singular values do not NaN.

Public API:
- ``svd3_soa(F)``: F is a mat-tuple of (N,) arrays -> (U, sig(vec), V) tuples.
- ``svd3(F)``: array convenience wrapper, F (..., 3, 3) -> (U, sig, V) arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from softmac_tpu.ops import m33

_JACOBI_SWEEPS = 5


def _jacobi_rotate(S, V, p, q):
    """One batched Jacobi rotation zeroing S[p][q] (S symmetric mat-tuple)."""
    app, aqq, apq = S[p][p], S[q][q], S[p][q]

    small = jnp.abs(apq) < 1e-30
    apq_safe = jnp.where(small, 1.0, apq)
    theta = jnp.clip(0.5 * (aqq - app) / apq_safe, -1e15, 1e15)
    t = jnp.sign(theta) / (jnp.abs(theta) + jnp.sqrt(1.0 + theta * theta))
    t = jnp.where(theta == 0.0, 1.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    c = jnp.where(small, 1.0, c)
    s = jnp.where(small, 0.0, s)

    # apply S' = J^T S J and V' = V J in explicit component form;
    # J = I with J[p][p]=c, J[p][q]=s, J[q][p]=-s, J[q][q]=c
    S_ = [list(row) for row in S]
    r = 3 - p - q  # the untouched index
    Spr, Sqr = S[p][r], S[q][r]
    S_[p][p] = c * c * app - 2.0 * s * c * apq + s * s * aqq
    S_[q][q] = s * s * app + 2.0 * s * c * apq + c * c * aqq
    S_[p][q] = S_[q][p] = (c * c - s * s) * apq + s * c * (app - aqq)
    S_[p][r] = S_[r][p] = c * Spr - s * Sqr
    S_[q][r] = S_[r][q] = s * Spr + c * Sqr

    V_ = [list(row) for row in V]
    for i in range(3):
        vip, viq = V[i][p], V[i][q]
        V_[i][p] = c * vip - s * viq
        V_[i][q] = s * vip + c * viq

    return tuple(tuple(row) for row in S_), tuple(tuple(row) for row in V_)


def _sym_eig3(S):
    V = m33.identity()
    # broadcast identity entries to arrays lazily — jnp.where handles scalars
    for _ in range(_JACOBI_SWEEPS):
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            S, V = _jacobi_rotate(S, V, p, q)
    w = (S[0][0], S[1][1], S[2][2])
    return w, V


def _sort_desc(w, V):
    """Sort eigenvalues descending, permuting V columns (3-element network)."""
    w = list(w)
    cols = [m33.col(V, 0), m33.col(V, 1), m33.col(V, 2)]

    def cswap(i, j):
        swap = w[i] < w[j]
        w[i], w[j] = (jnp.where(swap, w[j], w[i]), jnp.where(swap, w[i], w[j]))
        ci, cj = cols[i], cols[j]
        cols[i] = m33.vwhere(swap, cj, ci)
        cols[j] = m33.vwhere(swap, ci, cj)

    cswap(0, 1)
    cswap(0, 2)
    cswap(1, 2)
    return tuple(w), m33.from_cols(*cols)


def _svd3_fwd_impl(F):
    S = m33.mmul(m33.mt(F), F)
    w, V = _sym_eig3(S)
    w, V = _sort_desc(w, V)

    # ensure V in SO(3)
    detV = m33.det(V)
    sgn = jnp.sign(detV)
    V = m33.from_cols(m33.col(V, 0), m33.col(V, 1), m33.vscale(m33.col(V, 2), sgn))

    B = m33.mmul(F, V)  # columns: sigma_i * u_i
    eps = 1e-10

    b0 = m33.col(B, 0)
    n0 = m33.norm(b0)
    e0 = (jnp.ones_like(n0), jnp.zeros_like(n0), jnp.zeros_like(n0))
    u0 = m33.vwhere(n0 > eps, m33.vscale(b0, 1.0 / jnp.maximum(n0, eps)), e0)

    b1 = m33.col(B, 1)
    u1 = m33.vsub(b1, m33.vscale(u0, m33.dot(b1, u0)))
    n1 = m33.norm(u1)
    # fallback: a unit vector orthogonal to u0
    ez = (jnp.zeros_like(n1), jnp.zeros_like(n1), jnp.ones_like(n1))
    ey = (jnp.zeros_like(n1), jnp.ones_like(n1), jnp.zeros_like(n1))
    alt = m33.cross(u0, ez)
    altn = m33.norm(alt)
    alt = m33.vwhere(altn > 0.1, alt, m33.cross(u0, ey))
    alt = m33.vscale(alt, 1.0 / m33.norm(alt, 1e-30))
    u1 = m33.vwhere(n1 > eps, m33.vscale(u1, 1.0 / jnp.maximum(n1, eps)), alt)

    u2 = m33.cross(u0, u1)  # right-handed => det(U) = +1
    U = m33.from_cols(u0, u1, u2)

    sig = (m33.dot(u0, b0), m33.dot(u1, b1), m33.dot(u2, m33.col(B, 2)))
    return U, sig, V


def _clamp_away_from_zero(a, eps=1e-6):
    return jnp.where(a >= 0, jnp.maximum(a, eps), jnp.minimum(a, -eps))


@jax.custom_vjp
def svd3_soa(F):
    """Struct-of-arrays 3x3 SVD: mat-tuple -> (U mat, sig vec, V mat)."""
    return _svd3_fwd_impl(F)


def _svd3_soa_fwd(F):
    out = _svd3_fwd_impl(F)
    return out, out


def _svd3_soa_bwd(res, g):
    U, sig, V = res
    gu, gsig_t, gv = g
    # cotangents arrive as the same tuple structure
    Ut, Vt = m33.mt(U), m33.mt(V)
    sig_mat = m33.diag_mat(sig)
    gsig_mat = m33.diag_mat(gsig_t)

    sigma_term = m33.mmul(U, m33.mmul(gsig_mat, Vt))

    s2 = tuple(s * s for s in sig)
    K = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            if i == j:
                K[i][j] = 0.0
            else:
                K[i][j] = 1.0 / _clamp_away_from_zero(s2[j] - s2[i])

    def hadamard(Km, M):
        return tuple(tuple(Km[i][j] * M[i][j] for j in range(3)) for i in range(3))

    UtgU = m33.msub(m33.mmul(Ut, gu), m33.mmul(m33.mt(gu), U))
    u_term = m33.mmul(U, m33.mmul(m33.mmul(hadamard(K, UtgU), sig_mat), Vt))

    VtgV = m33.msub(m33.mmul(Vt, gv), m33.mmul(m33.mt(gv), V))
    v_term = m33.mmul(U, m33.mmul(sig_mat, m33.mmul(hadamard(K, VtgV), Vt)))

    dF = m33.madd(m33.madd(u_term, v_term), sigma_term)
    return (dF,)


svd3_soa.defvjp(_svd3_soa_fwd, _svd3_soa_bwd)


# ---------------------------------------------------------------------------
# array-API convenience wrapper (tests, external use)
# ---------------------------------------------------------------------------
def svd3(F):
    """F (..., 3, 3) -> (U, sig (..., 3), V). Thin wrapper over svd3_soa."""
    Ft = tuple(tuple(F[..., i, j] for j in range(3)) for i in range(3))
    U, sig, V = svd3_soa(Ft)

    def pack_mat(M):
        rows = [jnp.stack(jnp.broadcast_arrays(*row), axis=-1) for row in M]
        return jnp.stack(rows, axis=-2)

    return pack_mat(U), jnp.stack(jnp.broadcast_arrays(*sig), axis=-1), pack_mat(V)
