"""Constitutive models in struct-of-arrays form.

Semantics mirror the reference's in-kernel stress computation
(``softmac/engine/mpm_simulator.py:219-248``): fixed-corotated and
neo-Hookean models crossed with plastic / elastic / liquid particle types.
All quantities are mat/vec tuples of (N,) arrays (see ops/m33.py).
"""
from __future__ import annotations

import jax.numpy as jnp

from softmac_tpu.ops import m33
from softmac_tpu.engine.types import (
    MAT_ELASTIC,
    MAT_LIQUID,
    MAT_PLASTIC,
    MODEL_COROTATED,
    MODEL_NEOHOOKEAN,
    MPMConfig,
)


def von_mises_return_map(F, U, sig, V, yield_stress, mu):
    """Von Mises plastic return mapping (reference compute_von_mises,
    ``mpm_simulator.py:167-182``). sig: vec tuple of (N,) singular values."""
    sig_c = tuple(jnp.maximum(s, 0.05) for s in sig)  # NaN guard (:169)
    eps_v = tuple(jnp.log(s) for s in sig_c)
    mean = (eps_v[0] + eps_v[1] + eps_v[2]) / 3.0
    eps_hat = tuple(e - mean for e in eps_v)
    ehn = jnp.sqrt(m33.dot(eps_hat, eps_hat) + 1e-8)
    delta_gamma = ehn - yield_stress / (2.0 * mu)

    yields = delta_gamma > 0
    scale = delta_gamma / ehn
    eps_proj = tuple(e - scale * h for e, h in zip(eps_v, eps_hat))
    sig_new = tuple(jnp.exp(e) for e in eps_proj)
    F_proj = m33.mmul(U, m33.mmul(m33.diag_mat(sig_new), m33.mt(V)))
    return m33.mwhere(yields, F_proj, F)


def compute_stress_and_F(cfg: MPMConfig, F_tmp, U, sig, V, mu, lam, yield_stress=None):
    """Returns (stress mat-tuple before the -dt*p_vol*4*inv_dx^2 scale, new_F).

    U/sig/V may be None for the neo-Hookean model (no SVD needed).
    """
    J = m33.det(F_tmp)

    if cfg.material_model == MODEL_COROTATED:
        if cfg.ptype == MAT_PLASTIC:
            if cfg.plastic_mode == "von_mises":
                new_F = von_mises_return_map(F_tmp, U, sig, V, yield_stress, mu)
            else:
                # the reference's active plastic path: clamp singular values
                # into [1-2e-3, 1+3e-3] (mpm_simulator.py:226-229)
                sig_new = tuple(jnp.clip(s, 1.0 - 2e-3, 1.0 + 3e-3) for s in sig)
                new_F = m33.mmul(U, m33.mmul(m33.diag_mat(sig_new), m33.mt(V)))
        elif cfg.ptype == MAT_ELASTIC:
            new_F = F_tmp
        elif cfg.ptype == MAT_LIQUID:
            # liquid has mu = 0 (lame_parameters, mpm_simulator.py:45), so
            # the corotated 2*mu*(F-R)F^T term vanishes identically and no
            # SVD/R is needed (needs_svd returns False for this combination
            # — a ~17% substep saving on the pour workload)
            cb = jnp.cbrt(J)  # sign-safe
            zero = jnp.zeros_like(cb)
            new_F = ((cb, zero, zero), (zero, cb, zero), (zero, zero, cb))
            return m33.madd_diag(m33.mscale(new_F, 0.0),
                                 lam * J * (J - 1.0)), new_F
        else:
            raise ValueError(cfg.ptype)

        R = m33.mmul(U, m33.mt(V))
        elastic = m33.mscale(
            m33.mmul(m33.msub(new_F, R), m33.mt(new_F)), 2.0 * mu)
        stress = m33.madd_diag(elastic, lam * J * (J - 1.0))
    elif cfg.material_model == MODEL_NEOHOOKEAN:
        if cfg.ptype == MAT_ELASTIC:
            new_F = F_tmp
        elif cfg.ptype == MAT_LIQUID:
            sq = jnp.sqrt(J)
            zero = jnp.zeros_like(sq)
            one = jnp.ones_like(sq)
            new_F = ((sq, zero, zero), (zero, sq, zero), (zero, zero, one))
        else:
            raise ValueError(f"neo-hookean supports elastic/liquid, got ptype={cfg.ptype}")
        stress = m33.madd_diag(
            m33.mscale(m33.mmul(new_F, m33.mt(new_F)), mu),
            lam * jnp.log(J) - mu)
    else:
        raise ValueError(cfg.material_model)

    return stress, new_F


def needs_svd(cfg: MPMConfig) -> bool:
    # corotated liquid has mu = 0, killing the only R-dependent stress term
    return cfg.material_model == MODEL_COROTATED and cfg.ptype != MAT_LIQUID


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
