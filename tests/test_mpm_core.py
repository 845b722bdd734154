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


def unpack(state):
    n = state.x.shape[-1]
    return (np.asarray(state.x).T, np.asarray(state.v).T,
            np.asarray(state.C).transpose(2, 0, 1),
            np.asarray(state.F).transpose(2, 0, 1))


@pytest.mark.parametrize("model,ptype", [
    (MODEL_NEOHOOKEAN, MAT_ELASTIC),
    (MODEL_COROTATED, MAT_ELASTIC),
    (MODEL_COROTATED, MAT_LIQUID),
    (MODEL_COROTATED, MAT_PLASTIC),
])
def test_substep_matches_oracle(model, ptype):
    cfg, params, state, (mu, lam) = make_scene(model=model, ptype=ptype)
    bodies = BodyState.identity(0, jnp.float64)

    xo, vo, Co, Fo = unpack(state)
    for it in range(30):
        state, _, _ = mpm.substep(cfg, params, (), state, bodies, 0)
        xo, vo, Co, Fo = oracle_substep(
            xo, vo, Co, Fo, dt=cfg.dt, n_grid=cfg.n_grid, mu=mu, lam=lam,
            gravity=(0.0, -9.8, 0.0), material_model=model, ptype=ptype,
            ground_friction=cfg.ground_friction)
    x, v, C, F = unpack(state)
    np.testing.assert_allclose(x, xo, atol=1e-10)
    np.testing.assert_allclose(v, vo, atol=1e-8)
    np.testing.assert_allclose(C, Co, atol=1e-6)
    np.testing.assert_allclose(F, Fo, atol=1e-10)


def zero_mat(n):
    z = jnp.zeros((n,), jnp.float64)
    return ((z, z, z), (z, z, z), (z, z, z))


def dense_grid(cfg, state, stress, impulse):
    x = (state.x[0], state.x[1], state.x[2])
    v = (state.v[0], state.v[1], state.v[2])
    C = tuple(tuple(state.C[i, j] for j in range(3)) for i in range(3))
    W, WD = mpm.axis_weights(cfg, x)
    Hyz, HyzDy, HyzDz = mpm.hyz_family(cfg, W, WD)
    return mpm.p2g_dense(cfg, W, WD, Hyz, HyzDy, HyzDz, v, C, stress, impulse)


def test_mass_conservation():
    cfg, params, state, _ = make_scene(n=128)
    z = jnp.zeros((128,), jnp.float64)
    grid = dense_grid(cfg, state, zero_mat(128), (z, z, z))
    total_mass = float(jnp.sum(grid[0]))
    np.testing.assert_allclose(total_mass, cfg.p_mass * cfg.n_particles, rtol=1e-12)


def test_momentum_conservation_no_gravity_interior():
    """Without gravity/boundary effects, P2G->G2P conserves linear momentum."""
    cfg, params, state, _ = make_scene(gravity=(0.0, 0.0, 0.0))
    rng = np.random.RandomState(3)
    state = state.replace(v=jnp.asarray(0.1 * rng.randn(3, cfg.n_particles)))
    bodies = BodyState.identity(0, jnp.float64)
    new_state, _, _ = mpm.substep(cfg, params, (), state, bodies, 0)
    p0 = np.sum(np.asarray(state.v), axis=1) * cfg.p_mass
    p1 = np.sum(np.asarray(new_state.v), axis=1) * cfg.p_mass
    # exact up to the reference's grid-mass cutoff (cells with m <= 1e-10 are
    # zeroed, mpm_simulator.py:286), which drops a bounded momentum tail
    np.testing.assert_allclose(p1, p0, atol=1e-9)


def test_dense_splat_matches_scatter():
    """The MXU splat must agree with a naive scatter-add P2G, including the
    affine @ dpos momentum terms."""
    cfg, params, state, _ = make_scene(n=200, seed=5)
    rng = np.random.RandomState(7)
    state = state.replace(
        v=jnp.asarray(0.2 * rng.randn(3, 200)),
        C=jnp.asarray(0.5 * rng.randn(3, 3, 200)))
    stress = tuple(tuple(jnp.asarray(rng.randn(200)) for _ in range(3))
                   for _ in range(3))
    imp = tuple(jnp.asarray(0.01 * rng.randn(200)) for _ in range(3))

    grid = dense_grid(cfg, state, stress, imp)

    # naive scatter oracle
    ng = cfg.n_grid
    x = np.asarray(state.x)
    v = np.asarray(state.v)
    C = np.asarray(state.C)
    S = np.stack([[np.asarray(stress[i][j]) for j in range(3)] for i in range(3)])
    I = np.stack([np.asarray(c) for c in imp])
    base = np.floor(x * cfg.inv_dx - 0.5).astype(int)
    fx = x * cfg.inv_dx - base
    w = np.stack([0.5 * (1.5 - fx) ** 2, 0.75 - (fx - 1) ** 2, 0.5 * (fx - 0.5) ** 2])
    coef = -cfg.dt * cfg.p_vol * 4 * cfg.inv_dx ** 2
    affine = coef * S + cfg.p_mass * C
    gm = np.zeros((ng, ng, ng))
    gmom = np.zeros((3, ng, ng, ng))
    for i in range(3):
        for j in range(3):
            for k in range(3):
                weight = w[i, 0] * w[j, 1] * w[k, 2]
                dpos = (np.array([i, j, k])[:, None] - fx) * cfg.dx
                contrib = cfg.p_mass * v + I + np.einsum("abn,bn->an", affine, dpos)
                idx = (base[0] + i, base[1] + j, base[2] + k)
                np.add.at(gm, idx, weight * cfg.p_mass)
                for d in range(3):
                    np.add.at(gmom[d], idx, weight * contrib[d])

    # dense grid form is ((y,z), x); oracle is (x, y, z)
    gm_d = np.asarray(grid[0]).reshape(ng, ng, ng).transpose(2, 0, 1)
    np.testing.assert_allclose(gm_d, gm, atol=1e-12)
    for d in range(3):
        g_d = np.asarray(grid[1 + d]).reshape(ng, ng, ng).transpose(2, 0, 1)
        np.testing.assert_allclose(g_d, gmom[d], atol=1e-12)


def test_substep_gradient_finite():
    cfg, params, state, _ = make_scene(n=32)
    bodies = BodyState.identity(0, jnp.float64)

    def loss(v0):
        s = state.replace(v=v0)
        for _ in range(5):
            s, _, _ = mpm.substep(cfg, params, (), s, bodies, 0)
        return jnp.sum(s.x**2)

    g = jax.grad(loss)(state.v)
    assert np.all(np.isfinite(np.asarray(g)))

    # central-difference check on a few coordinates
    v0 = np.asarray(state.v).copy()
    eps = 1e-6
    for (i, j) in [(0, 0), (1, 7), (2, 20)]:
        vp = v0.copy(); vp[i, j] += eps
        vm = v0.copy(); vm[i, j] -= eps
        fd = (loss(jnp.asarray(vp)) - loss(jnp.asarray(vm))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[i, j], fd, rtol=1e-4, atol=1e-10)


def test_active_window_matches_full_grid():
    """A sufficiently large active window must reproduce the full-grid sim."""
    import dataclasses
    cfg, params, state, _ = make_scene(n=64, seed=9)
    bodies = BodyState.identity(0, jnp.float64)
    cfg_w = dataclasses.replace(cfg, active_window=(16, 16, 16))

    s_full, s_win = state, state
    for _ in range(20):
        s_full, _, _ = mpm.substep(cfg, params, (), s_full, bodies, 0)
        s_win, _, aux = mpm.substep(cfg_w, params, (), s_win, bodies, 0)
        assert not bool(aux["window_overflow"])
    np.testing.assert_allclose(s_win.x, s_full.x, atol=1e-12)
    np.testing.assert_allclose(s_win.v, s_full.v, atol=1e-12)
    np.testing.assert_allclose(s_win.F, s_full.F, atol=1e-12)

    # too-small window must raise the overflow flag
    cfg_bad = dataclasses.replace(cfg, active_window=(4, 4, 4))
    _, _, aux = mpm.substep(cfg_bad, params, (), state, bodies, 0)
    assert bool(aux["window_overflow"])


def test_sorted_substep_equivariant():
    """Spatial sort (perm) -> substep -> unsort (inv) must equal the plain
    substep: the per-env-step y-cell sort (env.py) is physics-neutral. Uses
    per-particle-VARYING params so the params permutation is exercised."""
    cfg, params, state, _ = make_scene(n=200, seed=13)
    rng = np.random.RandomState(14)
    params = params.replace(
        mu=params.mu * (1.0 + 0.1 * jnp.asarray(rng.rand(200))),
        lam=params.lam * (1.0 + 0.1 * jnp.asarray(rng.rand(200))))
    state = state.replace(v=jnp.asarray(0.5 * rng.randn(3, 200)))
    bodies = BodyState.identity(0, jnp.float64)

    ref = state
    for _ in range(5):
        ref, _, _ = mpm.substep(cfg, params, (), ref, bodies, 0)

    perm, inv = mpm.sort_perm(cfg, (state.x[0], state.x[1], state.x[2]))
    np.testing.assert_array_equal(np.asarray(perm)[np.asarray(inv)],
                                  np.arange(200))
    s = mpm.permute_state(state, perm)
    p = mpm.permute_params(params, perm)
    for _ in range(5):
        s, _, _ = mpm.substep(cfg, p, (), s, bodies, 0)
    s = mpm.permute_state(s, inv)
    np.testing.assert_allclose(s.x, ref.x, atol=1e-12)
    np.testing.assert_allclose(s.v, ref.v, atol=1e-12)
    np.testing.assert_allclose(s.F, ref.F, atol=1e-12)

    # sorted order is monotone in the base y-cell
    key = np.floor(np.asarray(state.x[1]) * cfg.inv_dx - 0.5).astype(int)
    assert (np.diff(key[np.asarray(perm)]) >= 0).all()
