"""Constitutive models: first Piola-Kirchhoff-style stress used by MLS-MPM.

Semantics mirror the reference's in-kernel stress computation
(``softmac/engine/mpm_simulator.py:219-248``): fixed-corotated and
neo-Hookean models crossed with plastic / elastic / liquid particle types.
All functions are batched over particles and pure.
"""
from __future__ import annotations

import jax.numpy as jnp

from softmac_tpu.engine.types import (
    MAT_ELASTIC,
    MAT_LIQUID,
    MAT_PLASTIC,
    MODEL_COROTATED,
    MODEL_NEOHOOKEAN,
    MPMConfig,
)


def _eye_like(F):
    return jnp.broadcast_to(jnp.eye(3, dtype=F.dtype), F.shape)


def von_mises_return_map(F, U, sig, V, yield_stress, mu):
    """Von Mises plastic return mapping (reference compute_von_mises,
    ``mpm_simulator.py:167-182``). sig: (N, 3) singular values."""
    sig_c = jnp.maximum(sig, 0.05)  # NaN guard from the reference (:169)
    epsilon = jnp.log(sig_c)
    epsilon_hat = epsilon - jnp.mean(epsilon, axis=-1, keepdims=True)
    ehn = jnp.sqrt(jnp.sum(epsilon_hat**2, axis=-1) + 1e-8)
    delta_gamma = ehn - yield_stress / (2.0 * mu)

    yields = delta_gamma > 0
    eps_proj = epsilon - (delta_gamma / ehn)[:, None] * epsilon_hat
    sig_new = jnp.exp(eps_proj)
    sig_mat = jnp.zeros_like(U).at[..., 0, 0].set(sig_new[..., 0]) \
        .at[..., 1, 1].set(sig_new[..., 1]).at[..., 2, 2].set(sig_new[..., 2])
    F_proj = U @ sig_mat @ jnp.swapaxes(V, -1, -2)
    return jnp.where(yields[:, None, None], F_proj, F)


def compute_stress_and_F(cfg: MPMConfig, F_tmp, U, sig, V, mu, lam, yield_stress=None):
    """Returns (stress (N,3,3) before the -dt*p_vol*4*inv_dx^2 scale, new_F).

    U/sig/V may be None for the neo-Hookean model (no SVD needed).
    """
    J = jnp.linalg.det(F_tmp)
    eye = _eye_like(F_tmp)

    if cfg.material_model == MODEL_COROTATED:
        if cfg.ptype == MAT_PLASTIC:
            if cfg.plastic_mode == "von_mises":
                new_F = von_mises_return_map(F_tmp, U, sig, V, yield_stress, mu)
            else:
                # the reference's active plastic path: clamp singular values
                # into [1-2e-3, 1+3e-3] (mpm_simulator.py:226-229)
                sig_new = jnp.clip(sig, 1.0 - 2e-3, 1.0 + 3e-3)
                sig_mat = jnp.zeros_like(U).at[..., 0, 0].set(sig_new[..., 0]) \
                    .at[..., 1, 1].set(sig_new[..., 1]).at[..., 2, 2].set(sig_new[..., 2])
                new_F = U @ sig_mat @ jnp.swapaxes(V, -1, -2)
        elif cfg.ptype == MAT_ELASTIC:
            new_F = F_tmp
        elif cfg.ptype == MAT_LIQUID:
            # new_F = I * J^(1/3); cbrt is sign-safe unlike pow
            new_F = eye * jnp.cbrt(J)[:, None, None]
        else:
            raise ValueError(cfg.ptype)

        R = U @ jnp.swapaxes(V, -1, -2)
        stress = (
            2.0 * mu[:, None, None] * (new_F - R) @ jnp.swapaxes(new_F, -1, -2)
            + eye * (lam * J * (J - 1.0))[:, None, None]
        )
    elif cfg.material_model == MODEL_NEOHOOKEAN:
        if cfg.ptype == MAT_ELASTIC:
            new_F = F_tmp
        elif cfg.ptype == MAT_LIQUID:
            sqrtJ = jnp.sqrt(J)
            new_F = jnp.zeros_like(F_tmp)
            new_F = new_F.at[..., 0, 0].set(sqrtJ).at[..., 1, 1].set(sqrtJ) \
                .at[..., 2, 2].set(jnp.ones_like(sqrtJ))
        else:
            raise ValueError(f"neo-hookean supports elastic/liquid, got ptype={cfg.ptype}")
        stress = (
            mu[:, None, None] * (new_F @ jnp.swapaxes(new_F, -1, -2))
            + eye * (lam * jnp.log(J) - mu)[:, None, None]
        )
    else:
        raise ValueError(cfg.material_model)

    return stress, new_F


def needs_svd(cfg: MPMConfig) -> bool:
    return cfg.material_model == MODEL_COROTATED


def lame_parameters(E: float, nu: float, ptype: int):
    """Lame parameters with the reference's per-type softening
    (mpm_simulator.py:41-45)."""
    mu = E / (2.0 * (1.0 + nu))
    lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    if ptype == MAT_ELASTIC:
        mu, lam = 0.3 * mu, 0.3 * lam
    elif ptype == MAT_LIQUID:
        mu = 0.0
    return mu, lam
