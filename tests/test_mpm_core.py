import jax
import jax.numpy as jnp
import numpy as np
import pytest

from softmac_tpu.engine import mpm
from softmac_tpu.engine.materials import lame_parameters
from softmac_tpu.engine.types import (
    MODEL_COROTATED, MODEL_NEOHOOKEAN, MAT_ELASTIC, MAT_LIQUID, MAT_PLASTIC,
    CONTACT_GRID, MPMConfig, MPMParams, MPMState, BodyState, mpm_state_zero,
)
from oracle import oracle_substep


def make_scene(n=64, seed=0, ptype=MAT_ELASTIC, model=MODEL_NEOHOOKEAN,
               E=5e3, nu=0.2, gravity=(0.0, -9.8, 0.0), ground_friction=1.5,
               dt=1e-4):
    rng = np.random.RandomState(seed)
    x = 0.45 + 0.1 * rng.rand(n, 3)
    cfg = MPMConfig(
        n_particles=n, n_grid=64, dt=dt, substeps=10,
        material_model=model, ptype=ptype, collision_type=CONTACT_GRID,
        ground_friction=ground_friction, n_primitives=0,
        primitives_contact=(), enable_external_force=(),
        dtype=jnp.float64,
    )
    mu, lam = lame_parameters(E, nu, ptype)
    params = MPMParams(
        mu=jnp.full((n,), mu, jnp.float64),
        lam=jnp.full((n,), lam, jnp.float64),
        yield_stress=jnp.full((n,), 50.0, jnp.float64),
        gravity=jnp.asarray(gravity, jnp.float64),
        control_idx=jnp.full((n,), -1, jnp.int32),
        friction=jnp.zeros((0,)),
        softness=jnp.zeros((0,)),
    )
    state = mpm_state_zero(cfg, jnp.asarray(x))
    return cfg, params, state, (mu, lam)


@pytest.mark.parametrize("model,ptype", [
    (MODEL_NEOHOOKEAN, MAT_ELASTIC),
    (MODEL_COROTATED, MAT_ELASTIC),
    (MODEL_COROTATED, MAT_LIQUID),
    (MODEL_COROTATED, MAT_PLASTIC),
])
def test_substep_matches_oracle(model, ptype):
    cfg, params, state, (mu, lam) = make_scene(model=model, ptype=ptype)
    bodies = BodyState.identity(0, jnp.float64)

    step = jax.jit(lambda s: mpm.substep(cfg, params, (), s, bodies, 0)[0])

    xo, vo, Co, Fo = (np.asarray(state.x), np.asarray(state.v),
                      np.asarray(state.C), np.asarray(state.F))
    for it in range(30):
        state, _ = mpm.substep(cfg, params, (), state, bodies, 0)
        xo, vo, Co, Fo = oracle_substep(
            xo, vo, Co, Fo, dt=cfg.dt, n_grid=cfg.n_grid, mu=mu, lam=lam,
            gravity=(0.0, -9.8, 0.0), material_model=model, ptype=ptype,
            ground_friction=cfg.ground_friction)
    np.testing.assert_allclose(state.x, xo, atol=1e-10)
    np.testing.assert_allclose(state.v, vo, atol=1e-8)
    np.testing.assert_allclose(state.C, Co, atol=1e-6)
    np.testing.assert_allclose(state.F, Fo, atol=1e-10)


def test_mass_conservation():
    cfg, params, state, _ = make_scene(n=128)
    F_tmp = state.F
    grid = mpm.p2g(cfg, state, state.F, jnp.zeros_like(state.F),
                   jnp.zeros_like(state.v))
    total_mass = float(jnp.sum(grid[:, 0]))
    np.testing.assert_allclose(total_mass, cfg.p_mass * cfg.n_particles, rtol=1e-12)


def test_momentum_conservation_no_gravity_interior():
    """Without gravity/boundary effects, P2G->G2P conserves linear momentum."""
    cfg, params, state, _ = make_scene(gravity=(0.0, 0.0, 0.0))
    rng = np.random.RandomState(3)
    state = state.replace(v=jnp.asarray(0.1 * rng.randn(cfg.n_particles, 3)))
    bodies = BodyState.identity(0, jnp.float64)
    new_state, _ = mpm.substep(cfg, params, (), state, bodies, 0)
    p0 = np.sum(np.asarray(state.v), axis=0) * cfg.p_mass
    p1 = np.sum(np.asarray(new_state.v), axis=0) * cfg.p_mass
    # exact up to the reference's grid-mass cutoff (cells with m <= 1e-10 are
    # zeroed, mpm_simulator.py:286), which drops a bounded momentum tail
    np.testing.assert_allclose(p1, p0, atol=1e-9)


def test_scatter_methods_agree():
    cfg, params, state, _ = make_scene(n=200, seed=5)
    g1 = mpm.p2g(cfg, state, state.F, jnp.zeros_like(state.F),
                 jnp.zeros_like(state.v), scatter_method="scatter")
    g2 = mpm.p2g(cfg, state, state.F, jnp.zeros_like(state.F),
                 jnp.zeros_like(state.v), scatter_method="sort")
    np.testing.assert_allclose(g1, g2, atol=1e-12)


def test_substep_gradient_finite():
    cfg, params, state, _ = make_scene(n=32)
    bodies = BodyState.identity(0, jnp.float64)

    def loss(v0):
        s = state.replace(v=v0)
        for _ in range(5):
            s, _ = mpm.substep(cfg, params, (), s, bodies, 0)
        return jnp.sum(s.x**2)

    g = jax.grad(loss)(state.v)
    assert np.all(np.isfinite(np.asarray(g)))

    # central-difference check on a few coordinates
    v0 = np.asarray(state.v).copy()
    eps = 1e-6
    for (i, j) in [(0, 0), (7, 1), (20, 2)]:
        vp = v0.copy(); vp[i, j] += eps
        vm = v0.copy(); vm[i, j] -= eps
        fd = (loss(jnp.asarray(vp)) - loss(jnp.asarray(vm))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[i, j], fd, rtol=1e-4, atol=1e-10)
