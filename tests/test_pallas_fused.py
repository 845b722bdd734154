"""Fused transfer kernels (ops/pallas_fused.py) vs the production dense
path, in Pallas interpret mode on CPU.

Tolerances are set for the kernels' manual bf16x3 dot decomposition
(~1e-3 relative worst case) — the same precision class as the production
XLA matmuls (Precision.HIGH) — compared against the exact-f32 CPU math.

The fused kernels must reproduce mpm.p2g_dense / g2p_dense (which the f64
oracle validates) to f32 roundoff, and their custom VJPs must match
autodiff of the dense path.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from softmac_tpu.engine import mpm
from softmac_tpu.engine.types import MPMConfig
from softmac_tpu.ops import m33, pallas_fused

pytestmark = pytest.mark.skipif(not pallas_fused._HAS_PALLAS,
                                reason="pallas unavailable")


def _setup(n=700, seed=0, window=(40, 32, 16)):
    rng = np.random.default_rng(seed)
    cfg = MPMConfig(n_particles=n, n_grid=64, dt=1e-4,
                    substeps=19, active_window=window)
    x = (0.25 + 0.5 * rng.random((3, n))).astype(np.float32)
    x_vec = tuple(jnp.asarray(x[d]) for d in range(3))
    sizes, corner, _ = mpm.window_geometry(cfg, x_vec)
    W, WD = mpm.axis_weights(cfg, x_vec, sizes, corner)
    v = tuple(jnp.asarray(rng.standard_normal(n), jnp.float32)
              for _ in range(3))
    C = tuple(tuple(jnp.asarray(0.1 * rng.standard_normal(n), jnp.float32)
                    for _ in range(3)) for _ in range(3))
    stress = tuple(tuple(jnp.asarray(rng.standard_normal(n), jnp.float32)
                         for _ in range(3)) for _ in range(3))
    impulse = tuple(jnp.asarray(1e-3 * rng.standard_normal(n), jnp.float32)
                    for _ in range(3))
    return cfg, W, WD, v, C, stress, impulse


def _fused_inputs(cfg, W, WD, v, C, stress, impulse):
    stress_coef = -cfg.dt * cfg.p_vol * 4.0 * cfg.inv_dx * cfg.inv_dx
    affine = m33.madd(m33.mscale(stress, stress_coef),
                      m33.mscale(C, cfg.p_mass))
    affine_dx = m33.mscale(affine, cfg.dx)
    mom = tuple(cfg.p_mass * v[d] + impulse[d] for d in range(3))
    mass = jnp.full_like(v[0], cfg.p_mass)
    chan = pallas_fused.pack_channels(mass, mom, affine_dx)
    return (W[0], WD[0], W[1], WD[1], W[2], WD[2]), chan


def test_p2g_matches_dense(monkeypatch):
    monkeypatch.setattr(pallas_fused, "_INTERPRET", True)
    cfg, W, WD, v, C, stress, impulse = _setup()
    Hyz, HyzDy, HyzDz = mpm.hyz_family(cfg, W, WD)
    ref = mpm.p2g_dense(cfg, W, WD, Hyz, HyzDy, HyzDz, v, C, stress, impulse)

    ws, chan = _fused_inputs(cfg, W, WD, v, C, stress, impulse)
    gm, gmom = pallas_fused.p2g(*ws, chan)
    wx = W[0].shape[0]
    np.testing.assert_allclose(gm, ref[0], rtol=2e-3, atol=2e-3)
    for d in range(3):
        np.testing.assert_allclose(gmom[:, d * wx:(d + 1) * wx], ref[1 + d],
                                   rtol=2e-3, atol=2e-3)


def test_g2p_matches_dense(monkeypatch):
    monkeypatch.setattr(pallas_fused, "_INTERPRET", True)
    cfg, W, WD, v, C, stress, impulse = _setup(seed=1)
    rng = np.random.default_rng(2)
    wx, wy, wz = 40, 32, 16
    gv = tuple(jnp.asarray(rng.standard_normal((wy * wz, wx)), jnp.float32)
               for _ in range(3))
    x_vec = v  # any (3, N) vector works for advection comparison

    Hyz, HyzDy, HyzDz = mpm.hyz_family(cfg, W, WD)
    v_ref, C_ref, x_ref = mpm.g2p_dense(cfg, W, WD, Hyz, HyzDy, HyzDz, gv,
                                        x_vec)

    ws = (W[0], WD[0], W[1], WD[1], W[2], WD[2])
    out = pallas_fused.g2p(*ws, *gv)
    scale = 4.0 * cfg.inv_dx
    for d in range(3):
        np.testing.assert_allclose(out[d], v_ref[d], rtol=2e-3, atol=2e-3)
        for j in range(3):
            np.testing.assert_allclose(scale * out[3 + 3 * d + j],
                                       C_ref[d][j], rtol=2e-3, atol=3e-3)


def test_gather_splat_match_dense(monkeypatch):
    monkeypatch.setattr(pallas_fused, "_INTERPRET", True)
    cfg, W, WD, v, C, stress, impulse = _setup(seed=7)
    rng = np.random.default_rng(8)
    wx, wy, wz = 40, 32, 16
    gv = tuple(jnp.asarray(rng.standard_normal((wy * wz, wx)), jnp.float32)
               for _ in range(3))
    Hyz, _, _ = mpm.hyz_family(cfg, W, WD)

    v_ref = mpm.gather_dense(cfg, W, Hyz, gv)
    got = pallas_fused.gather(W[0], W[1], W[2], *gv)
    for d in range(3):
        np.testing.assert_allclose(got[d], v_ref[d], rtol=2e-3, atol=2e-3)

    vals = [jnp.asarray(rng.standard_normal(cfg.n_particles), jnp.float32)
            for _ in range(3)]
    s_ref = mpm.splat_channels(cfg, W, Hyz, vals)
    got = pallas_fused.splat(W[0], W[1], W[2], jnp.stack(vals))
    for d in range(3):
        np.testing.assert_allclose(got[:, d * wx:(d + 1) * wx], s_ref[d],
                                   rtol=2e-3, atol=2e-3)

    # grads vs the reference impls
    pg = jnp.asarray(rng.standard_normal((3, cfg.n_particles)), jnp.float32)
    args = (W[0], W[1], W[2]) + gv
    g_f = jax.grad(lambda a: jnp.sum(pallas_fused.gather(*a) * pg))(args)
    g_r = jax.grad(lambda a: jnp.sum(pallas_fused._gather_ref(*a) * pg))(args)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(a, b, rtol=3e-3, atol=3e-3)

    ps = jnp.asarray(rng.standard_normal((wy * wz, 3 * wx)), jnp.float32)
    args = (W[0], W[1], W[2], jnp.stack(vals))
    g_f = jax.grad(lambda a: jnp.sum(pallas_fused.splat(*a) * ps))(args)
    g_r = jax.grad(lambda a: jnp.sum(pallas_fused._splat_ref(*a) * ps))(args)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(a, b, rtol=3e-3, atol=3e-3)


@pytest.mark.parametrize("window", [(32, 16, 32), (48, 24, 48)])
def test_other_window_geometries(monkeypatch, window):
    """Door (32,16,32) and taco (48,24,48) window shapes through p2g and
    g2p — the kernels must be shape-generic across every demo config."""
    monkeypatch.setattr(pallas_fused, "_INTERPRET", True)
    cfg, W, WD, v, C, stress, impulse = _setup(n=500, seed=11, window=window)
    wx, wy, wz = window
    Hyz, HyzDy, HyzDz = mpm.hyz_family(cfg, W, WD)

    ref = mpm.p2g_dense(cfg, W, WD, Hyz, HyzDy, HyzDz, v, C, stress, impulse)
    ws, chan = _fused_inputs(cfg, W, WD, v, C, stress, impulse)
    gm, gmom = pallas_fused.p2g(*ws, chan)
    np.testing.assert_allclose(gm, ref[0], rtol=2e-3, atol=2e-3)
    for d in range(3):
        np.testing.assert_allclose(gmom[:, d * wx:(d + 1) * wx], ref[1 + d],
                                   rtol=2e-3, atol=2e-3)

    rng = np.random.default_rng(12)
    gv = tuple(jnp.asarray(rng.standard_normal((wy * wz, wx)), jnp.float32)
               for _ in range(3))
    v_ref, C_ref, _ = mpm.g2p_dense(cfg, W, WD, Hyz, HyzDy, HyzDz, gv, v)
    out = pallas_fused.g2p(*ws, *gv)
    scale = 4.0 * cfg.inv_dx
    for d in range(3):
        np.testing.assert_allclose(out[d], v_ref[d], rtol=2e-3, atol=2e-3)
        for j in range(3):
            np.testing.assert_allclose(scale * out[3 + 3 * d + j],
                                       C_ref[d][j], rtol=2e-3, atol=3e-3)


def test_substep_fused_route_matches_dense(monkeypatch):
    """End-to-end substep: the fused route (platform_dependent picks the XLA
    reference branch on CPU; the kernels themselves are covered in interpret
    mode above) must match the dense production path."""
    from softmac_tpu.engine.types import MPMParams, BodyState

    n = 400
    rng = np.random.default_rng(9)
    cfg = MPMConfig(n_particles=n, n_grid=64, dt=1e-4, substeps=19,
                    collision_type=2,  # CONTACT_MIXED, no prims -> pure MPM
                    active_window=(40, 32, 16))
    params = MPMParams(
        mu=jnp.full((n,), 416.67, jnp.float32),
        lam=jnp.full((n,), 277.78, jnp.float32),
        yield_stress=jnp.full((n,), 1e30, jnp.float32),
        gravity=jnp.asarray([0.0, -9.8, 0.0], jnp.float32),
        control_idx=jnp.full((n,), -1, jnp.int32),
        friction=jnp.zeros((0,), jnp.float32),
        softness=jnp.zeros((0,), jnp.float32))
    from softmac_tpu.engine.types import MPMState
    state = MPMState(
        x=jnp.asarray(0.35 + 0.3 * rng.random((3, n)), jnp.float32),
        v=jnp.asarray(0.1 * rng.standard_normal((3, n)), jnp.float32),
        C=jnp.asarray(0.05 * rng.standard_normal((3, 3, n)), jnp.float32),
        F=jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32)[:, :, None],
                                      (3, 3, n)).copy()))
    bodies = BodyState(pos=jnp.zeros((0, 3), jnp.float32),
                       quat=jnp.zeros((0, 4), jnp.float32),
                       v=jnp.zeros((0, 3), jnp.float32),
                       w=jnp.zeros((0, 3), jnp.float32))

    # pin to the fused family (the chunked upgrade needs sorted particles;
    # its substep route is covered in tests/test_pallas_chunked.py)
    monkeypatch.setattr(mpm, "_chunked_transfer_wanted", lambda *a: False)
    s_fused, _, _ = mpm.substep(cfg, params, (), state, bodies, 0)
    monkeypatch.setattr(mpm, "_fused_transfer_wanted", lambda *a: False)
    s_dense, _, _ = mpm.substep(cfg, params, (), state, bodies, 0)
    np.testing.assert_allclose(s_fused.x, s_dense.x, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(s_fused.v, s_dense.v, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(s_fused.C, s_dense.C, rtol=1e-3, atol=1e-3)


def test_p2g_grad_matches_dense(monkeypatch):
    monkeypatch.setattr(pallas_fused, "_INTERPRET", True)
    cfg, W, WD, v, C, stress, impulse = _setup(n=300, seed=3)
    ws, chan = _fused_inputs(cfg, W, WD, v, C, stress, impulse)

    rng = np.random.default_rng(4)
    wx, wy, wz = 40, 32, 16
    pm = jnp.asarray(rng.standard_normal((wy * wz, wx)), jnp.float32)
    pmom = jnp.asarray(rng.standard_normal((wy * wz, 3 * wx)), jnp.float32)

    def loss_fused(args):
        gm, gmom = pallas_fused.p2g(*args)
        return jnp.sum(gm * pm) + jnp.sum(gmom * pmom)

    def loss_ref(args):
        gm, gmom = pallas_fused._p2g_ref(*args)
        return jnp.sum(gm * pm) + jnp.sum(gmom * pmom)

    args = ws + (chan,)
    g_fused = jax.grad(loss_fused)(args)
    g_ref = jax.grad(loss_ref)(args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(a, b, rtol=3e-3, atol=3e-3)


def test_g2p_grad_matches_dense(monkeypatch):
    monkeypatch.setattr(pallas_fused, "_INTERPRET", True)
    cfg, W, WD, v, C, stress, impulse = _setup(n=300, seed=5)
    ws = (W[0], WD[0], W[1], WD[1], W[2], WD[2])
    rng = np.random.default_rng(6)
    wx, wy, wz = 40, 32, 16
    gv = tuple(jnp.asarray(rng.standard_normal((wy * wz, wx)), jnp.float32)
               for _ in range(3))
    pg = jnp.asarray(rng.standard_normal((16, 300)), jnp.float32)

    def loss_fused(args):
        return jnp.sum(pallas_fused.g2p(*args) * pg)

    def loss_ref(args):
        return jnp.sum(pallas_fused._g2p_ref(*args) * pg)

    args = ws + gv
    g_fused = jax.grad(loss_fused)(args)
    g_ref = jax.grad(loss_ref)(args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(a, b, rtol=3e-3, atol=3e-3)


def test_multi_tile_grid(monkeypatch):
    """All four transfer kernels + grads with a forced 256-wide tile so
    n=700 spans 3 grid steps with a padded remainder. Regression for the
    pad/grid mismatch where wrappers padded n to the DEFAULT tile multiple
    but ran the grid at their own smaller tile, silently never computing
    the trailing particles (bit at 1e5 particles in production; the n<=tile
    tests above cannot see it)."""
    monkeypatch.setattr(pallas_fused, "_INTERPRET", True)
    monkeypatch.setattr(pallas_fused, "_pick_tile",
                        lambda rows, cap=None: 256)
    cfg, W, WD, v, C, stress, impulse = _setup(n=700, seed=21)
    wx, wy, wz = 40, 32, 16
    Hyz, HyzDy, HyzDz = mpm.hyz_family(cfg, W, WD)
    ws, chan = _fused_inputs(cfg, W, WD, v, C, stress, impulse)
    rng = np.random.default_rng(22)
    gv = tuple(jnp.asarray(rng.standard_normal((wy * wz, wx)), jnp.float32)
               for _ in range(3))

    ref = mpm.p2g_dense(cfg, W, WD, Hyz, HyzDy, HyzDz, v, C, stress, impulse)
    gm, gmom = pallas_fused.p2g(*ws, chan)
    np.testing.assert_allclose(gm, ref[0], rtol=2e-3, atol=2e-3)

    v_ref, C_ref, _ = mpm.g2p_dense(cfg, W, WD, Hyz, HyzDy, HyzDz, gv, v)
    out = pallas_fused.g2p(*ws, *gv)
    for d in range(3):
        np.testing.assert_allclose(out[d], v_ref[d], rtol=2e-3, atol=2e-3)

    got = pallas_fused.gather(W[0], W[1], W[2], *gv)
    v_ref = mpm.gather_dense(cfg, W, Hyz, gv)
    for d in range(3):
        np.testing.assert_allclose(got[d], v_ref[d], rtol=2e-3, atol=2e-3)

    vals = jnp.asarray(rng.standard_normal((3, 700)), jnp.float32)
    s_ref = mpm.splat_channels(cfg, W, Hyz, [vals[d] for d in range(3)])
    got = pallas_fused.splat(W[0], W[1], W[2], vals)
    for d in range(3):
        np.testing.assert_allclose(got[:, d * wx:(d + 1) * wx], s_ref[d],
                                   rtol=2e-3, atol=2e-3)

    # grads through every kernel at the multi-tile grid
    pg = jnp.asarray(rng.standard_normal((16, 700)), jnp.float32)
    args = ws + gv
    g_f = jax.grad(lambda a: jnp.sum(pallas_fused.g2p(*a) * pg))(args)
    g_r = jax.grad(lambda a: jnp.sum(pallas_fused._g2p_ref(*a) * pg))(args)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(a, b, rtol=3e-3, atol=3e-3)

    pm = jnp.asarray(rng.standard_normal((wy * wz, wx)), jnp.float32)
    pmom = jnp.asarray(rng.standard_normal((wy * wz, 3 * wx)), jnp.float32)
    args = ws + (chan,)
    g_f = jax.grad(lambda a: (lambda o: jnp.sum(o[0] * pm)
                              + jnp.sum(o[1] * pmom))(
                                  pallas_fused.p2g(*a)))(args)
    g_r = jax.grad(lambda a: (lambda o: jnp.sum(o[0] * pm)
                              + jnp.sum(o[1] * pmom))(
                                  pallas_fused._p2g_ref(*a)))(args)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(a, b, rtol=3e-3, atol=3e-3)

    pv = jnp.asarray(rng.standard_normal((3, 700)), jnp.float32)
    args = (W[0], W[1], W[2]) + gv
    g_f = jax.grad(lambda a: jnp.sum(pallas_fused.gather(*a) * pv))(args)
    g_r = jax.grad(lambda a: jnp.sum(pallas_fused._gather_ref(*a) * pv))(args)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(a, b, rtol=3e-3, atol=3e-3)

    ps = jnp.asarray(rng.standard_normal((wy * wz, 3 * wx)), jnp.float32)
    args = (W[0], W[1], W[2], vals)
    g_f = jax.grad(lambda a: jnp.sum(pallas_fused.splat(*a) * ps))(args)
    g_r = jax.grad(lambda a: jnp.sum(pallas_fused._splat_ref(*a) * ps))(args)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(a, b, rtol=3e-3, atol=3e-3)
