"""Batched differentiable 3x3 SVD for TPU.

Forward: cyclic Jacobi eigendecomposition of F^T F (fixed sweep count, fully
vectorized over the particle batch — no data-dependent control flow, so it
maps to the VPU under jit). U is rebuilt from F V with Gram-Schmidt and a
cross product, guaranteeing U, V in SO(3); the singular values are then
recovered as diag(U^T F V), so the smallest one carries the sign of det(F) —
the same convention as Taichi's ``ti.svd`` which the reference relies on for
the corotated model's R = U V^T (``softmac/engine/mpm_simulator.py:131-134``).

Backward: custom VJP implementing the clamped-denominator rule the reference
hand-codes in ``backward_svd`` (``softmac/engine/mpm_simulator.py:140-157``):
the 1/(s_j - s_i) factors are clamped away from zero so repeated singular
values do not produce NaN (JAX's default SVD gradient does).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_JACOBI_SWEEPS = 5  # 5 cyclic sweeps => ~machine precision for 3x3


def _jacobi_rotation(S, V, p, q):
    """One batched Jacobi rotation zeroing S[p,q]; returns updated (S, V)."""
    app = S[..., p, p]
    aqq = S[..., q, q]
    apq = S[..., p, q]

    small = jnp.abs(apq) < 1e-30
    apq_safe = jnp.where(small, 1.0, apq)
    # clip so theta**2 cannot overflow (f32 on TPU); a clipped rotation is a
    # no-op to ~1e-15, which only happens when already converged
    theta = jnp.clip(0.5 * (aqq - app) / apq_safe, -1e15, 1e15)
    t = jnp.sign(theta) / (jnp.abs(theta) + jnp.sqrt(1.0 + theta * theta))
    # theta == 0 with apq != 0 needs the full 45-degree rotation, not a no-op
    t = jnp.where(theta == 0.0, 1.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    c = jnp.where(small, 1.0, c)
    s = jnp.where(small, 0.0, s)

    # build the rotation J (identity with a 2x2 rotation at (p,q))
    J = jnp.zeros_like(S)
    eye = jnp.eye(3, dtype=S.dtype)
    J = J + eye
    J = J.at[..., p, p].set(c)
    J = J.at[..., q, q].set(c)
    J = J.at[..., p, q].set(s)
    J = J.at[..., q, p].set(-s)

    S = jnp.swapaxes(J, -1, -2) @ S @ J
    V = V @ J
    return S, V


def _sym_eig3(S):
    """Eigendecomposition of batched symmetric 3x3 via cyclic Jacobi."""
    V = jnp.broadcast_to(jnp.eye(3, dtype=S.dtype), S.shape).copy()
    for _ in range(_JACOBI_SWEEPS):
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            S, V = _jacobi_rotation(S, V, p, q)
    w = jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], axis=-1)
    return w, V


def _sort_desc(w, V):
    """Sort eigenvalues descending, permuting V columns; 3-element network."""
    def cswap(w, V, i, j):
        swap = w[..., i] < w[..., j]
        wi = jnp.where(swap, w[..., j], w[..., i])
        wj = jnp.where(swap, w[..., i], w[..., j])
        w = w.at[..., i].set(wi).at[..., j].set(wj)
        vi = jnp.where(swap[..., None], V[..., :, j], V[..., :, i])
        vj = jnp.where(swap[..., None], V[..., :, i], V[..., :, j])
        V = V.at[..., :, i].set(vi).at[..., :, j].set(vj)
        return w, V

    w, V = cswap(w, V, 0, 1)
    w, V = cswap(w, V, 0, 2)
    w, V = cswap(w, V, 1, 2)
    return w, V


def _svd3_fwd_impl(F):
    S = jnp.swapaxes(F, -1, -2) @ F
    w, V = _sym_eig3(S)
    w, V = _sort_desc(w, V)

    # ensure V in SO(3)
    detV = jnp.linalg.det(V)
    V = V.at[..., :, 2].multiply(jnp.sign(detV)[..., None])

    B = F @ V  # columns: sigma_i * u_i
    eps = jnp.asarray(1e-10, F.dtype)

    u0 = B[..., :, 0]
    n0 = jnp.sqrt(jnp.sum(u0 * u0, axis=-1, keepdims=True))
    # fall back to e0 when the whole matrix is ~0 (never in MPM; F ~ I)
    u0 = jnp.where(n0 > eps, u0 / jnp.maximum(n0, eps),
                   jnp.zeros_like(u0).at[..., 0].set(1.0))

    u1 = B[..., :, 1]
    u1 = u1 - jnp.sum(u1 * u0, axis=-1, keepdims=True) * u0
    n1 = jnp.sqrt(jnp.sum(u1 * u1, axis=-1, keepdims=True))
    # fallback: any unit vector orthogonal to u0
    alt = jnp.cross(u0, jnp.zeros_like(u0).at[..., 2].set(1.0))
    alt_n = jnp.sqrt(jnp.sum(alt * alt, axis=-1, keepdims=True))
    alt2 = jnp.cross(u0, jnp.zeros_like(u0).at[..., 1].set(1.0))
    alt = jnp.where(alt_n > 0.1, alt, alt2)
    alt = alt / jnp.sqrt(jnp.sum(alt * alt, axis=-1, keepdims=True))
    u1 = jnp.where(n1 > eps, u1 / jnp.maximum(n1, eps), alt)

    u2 = jnp.cross(u0, u1)  # right-handed => det(U) = +1

    U = jnp.stack([u0, u1, u2], axis=-1)
    # sigma with sign convention: sigma_i = u_i . (F v_i)
    sig = jnp.stack(
        [jnp.sum(U[..., :, i] * B[..., :, i], axis=-1) for i in range(3)], axis=-1
    )
    return U, sig, V


def _clamp_away_from_zero(a, eps=1e-6):
    """sign(a) * max(|a|, eps) — the reference's denominator clamp
    (``mpm_simulator.py:184-192``)."""
    return jnp.where(a >= 0, jnp.maximum(a, eps), jnp.minimum(a, -eps))


@jax.custom_vjp
def svd3(F):
    """Batched 3x3 SVD. F: (..., 3, 3) -> (U, sigma, V).

    U, V in SO(3); sigma (..., 3) descending by magnitude, sigma[2] signed by
    det(F). Gradient is the clamped rule from the reference's backward_svd.
    """
    return _svd3_fwd_impl(F)


def _svd3_fwd(F):
    out = _svd3_fwd_impl(F)
    return out, out


def _svd3_bwd(res, g):
    U, sig, V = res
    gu, gsig, gv = g

    Ut = jnp.swapaxes(U, -1, -2)
    Vt = jnp.swapaxes(V, -1, -2)
    sig_mat = jnp.zeros_like(U).at[..., 0, 0].set(sig[..., 0]) \
        .at[..., 1, 1].set(sig[..., 1]).at[..., 2, 2].set(sig[..., 2])
    gsig_mat = jnp.zeros_like(U).at[..., 0, 0].set(gsig[..., 0]) \
        .at[..., 1, 1].set(gsig[..., 1]).at[..., 2, 2].set(gsig[..., 2])

    sigma_term = U @ gsig_mat @ Vt

    s2 = sig * sig
    # K[i, j] = 1 / clamp(s2[j] - s2[i]) off-diagonal, 0 on diagonal
    diff = s2[..., None, :] - s2[..., :, None]
    K = 1.0 / _clamp_away_from_zero(diff)
    K = K * (1.0 - jnp.eye(3, dtype=K.dtype))

    u_term = U @ ((K * (Ut @ gu - jnp.swapaxes(gu, -1, -2) @ U)) @ sig_mat) @ Vt
    v_term = U @ (sig_mat @ ((K * (Vt @ gv - jnp.swapaxes(gv, -1, -2) @ V)) @ Vt))

    return (u_term + v_term + sigma_term,)


svd3.defvjp(_svd3_fwd, _svd3_bwd)
