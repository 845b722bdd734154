"""Y-chunked transfer kernels (ops/pallas_chunked.py) vs the dense
reference path, in Pallas interpret mode on CPU.

Inputs are SORTED by base y-cell (the production precondition established
by the sorted-carry rollout, env._build_rollout); _TILE_C is shrunk to 256
so n=700 spans 3 tiles and exercises the dynamic-block accumulation, the
first-visit zeroing, and the A/B combine masks. When no tile overflows its
16-row window, the chunked results must equal the FULL dense references
(the truncation drops nothing). All weights are built in-kernel from the
position rows (chan 13-15 / pv 0-2 / vals 3-5)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from softmac_tpu.engine import mpm
from softmac_tpu.engine.types import MPMConfig
from softmac_tpu.ops import m33, pallas_chunked, pallas_fused

pytestmark = pytest.mark.skipif(not pallas_chunked._HAS_PALLAS,
                                reason="pallas unavailable")

WINDOW = (40, 32, 16)
WX, WY, WZ = WINDOW
N = 700


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    cfg = MPMConfig(n_particles=N, n_grid=64, dt=1e-4,
                    substeps=19, active_window=WINDOW)
    x = (0.42 + 0.16 * rng.random((3, N))).astype(np.float32)
    x = x[:, np.argsort(np.floor(x[1] * cfg.inv_dx - 0.5))]  # sorted by y
    x_vec = tuple(jnp.asarray(x[d]) for d in range(3))
    sizes, corner, _ = mpm.window_geometry(cfg, x_vec)
    W, WD = mpm.axis_weights(cfg, x_vec, sizes, corner)
    ps = tuple(x_vec[d] * cfg.inv_dx for d in range(3))
    meta, ovf = pallas_chunked.chunk_meta(ps[1], corner, WY)
    assert not bool(ovf)
    v = tuple(jnp.asarray(rng.standard_normal(N), jnp.float32)
              for _ in range(3))
    C = tuple(tuple(jnp.asarray(0.1 * rng.standard_normal(N), jnp.float32)
                    for _ in range(3)) for _ in range(3))
    stress = tuple(tuple(jnp.asarray(rng.standard_normal(N), jnp.float32)
                         for _ in range(3)) for _ in range(3))
    impulse = tuple(jnp.asarray(1e-3 * rng.standard_normal(N), jnp.float32)
                    for _ in range(3))
    return cfg, x_vec, ps, W, WD, meta, v, C, stress, impulse


@pytest.fixture()
def fam(monkeypatch):
    monkeypatch.setattr(pallas_chunked, "_INTERPRET", True)
    monkeypatch.setattr(pallas_chunked, "_TILE_C", 256)
    pallas_chunked.family.cache_clear()
    yield pallas_chunked.family(WINDOW)
    pallas_chunked.family.cache_clear()


def _chan(cfg, ps, v, C, stress, impulse):
    chan = mpm._p2g_channels(cfg, v, C, stress, impulse)
    return chan.at[13].set(ps[0]).at[14].set(ps[1]).at[15].set(ps[2])


def _pv(ps):
    return jnp.zeros((8, N), jnp.float32) \
        .at[0].set(ps[0]).at[1].set(ps[1]).at[2].set(ps[2])


def _vals8(vals3, ps):
    return jnp.concatenate(
        [vals3, jnp.stack([ps[0], ps[1], ps[2]]),
         jnp.zeros((2, N), jnp.float32)], axis=0)


def test_meta(fam):
    _, _, _, _, _, meta, *_ = _setup()
    m = np.asarray(meta)
    assert (np.diff(m[0]) >= 0).all()          # monotone block offsets
    assert m[1, 0] == 1                        # first tile zeroes
    assert (m[0] * 8 == m[3]).all()
    assert (m[4] == m[4, 0]).all() and (m[5] == m[5, 0]).all()  # corners


def test_p2g_chunked_matches_dense(fam):
    cfg, x_vec, ps, W, WD, meta, v, C, stress, impulse = _setup()
    Hyz, HyzDy, HyzDz = mpm.hyz_family(cfg, W, WD)
    ref = mpm.p2g_dense(cfg, W, WD, Hyz, HyzDy, HyzDz, v, C, stress, impulse)
    chan = _chan(cfg, ps, v, C, stress, impulse)

    gm, gmom = fam.p2g(chan, meta)
    np.testing.assert_allclose(gm, ref[0], rtol=2e-3, atol=2e-3)
    for d in range(3):
        np.testing.assert_allclose(gmom[:, d * WX:(d + 1) * WX], ref[1 + d],
                                   rtol=2e-3, atol=2e-3)

    # the truncation-aware XLA ref agrees too (it is the CPU branch)
    gm_r, gmom_r = fam.p2g_ref(chan, meta)
    np.testing.assert_allclose(gm_r, ref[0], rtol=1e-5, atol=1e-5)


def test_g2p_gather_splat_chunked_match_dense(fam):
    cfg, x_vec, ps, W, WD, meta, v, C, stress, impulse = _setup(seed=1)
    rng = np.random.default_rng(2)
    gv = tuple(jnp.asarray(rng.standard_normal((WY * WZ, WX)), jnp.float32)
               for _ in range(3))
    Hyz, HyzDy, HyzDz = mpm.hyz_family(cfg, W, WD)
    pv = _pv(ps)

    v_ref, C_ref, _ = mpm.g2p_dense(cfg, W, WD, Hyz, HyzDy, HyzDz, gv, v)
    out = fam.g2p(pv, *gv, meta)
    scale = 4.0 * cfg.inv_dx
    for d in range(3):
        np.testing.assert_allclose(out[d], v_ref[d], rtol=2e-3, atol=2e-3)
        for j in range(3):
            np.testing.assert_allclose(scale * out[3 + 3 * d + j],
                                       C_ref[d][j], rtol=2e-3, atol=3e-3)

    got = fam.gather(pv, *gv, meta)
    vg_ref = mpm.gather_dense(cfg, W, Hyz, gv)
    for d in range(3):
        np.testing.assert_allclose(got[d], vg_ref[d], rtol=2e-3, atol=2e-3)

    vals3 = jnp.asarray(rng.standard_normal((3, N)), jnp.float32)
    s_ref = mpm.splat_channels(cfg, W, Hyz, [vals3[d] for d in range(3)])
    got = fam.splat(_vals8(vals3, ps), meta)
    for d in range(3):
        np.testing.assert_allclose(got[:, d * WX:(d + 1) * WX], s_ref[d],
                                   rtol=2e-3, atol=2e-3)


def test_substep_chunked_route_matches_dense():
    """End-to-end substep over SORTED particles: the chunked route
    (platform_dependent picks the truncation-aware XLA refs on CPU; the
    kernels themselves are covered in interpret mode above) must match the
    dense production path, and the production sort order must keep every
    tile inside its 16-row window (no overflow)."""
    from softmac_tpu.engine.types import MPMParams, MPMState, BodyState

    n = 400
    rng = np.random.default_rng(9)
    cfg = MPMConfig(n_particles=n, n_grid=64, dt=1e-4, substeps=19,
                    collision_type=2,  # CONTACT_MIXED, no prims -> pure MPM
                    active_window=WINDOW)
    params = MPMParams(
        mu=jnp.full((n,), 416.67, jnp.float32),
        lam=jnp.full((n,), 277.78, jnp.float32),
        yield_stress=jnp.full((n,), 1e30, jnp.float32),
        gravity=jnp.asarray([0.0, -9.8, 0.0], jnp.float32),
        control_idx=jnp.full((n,), -1, jnp.int32),
        friction=jnp.zeros((0,), jnp.float32),
        softness=jnp.zeros((0,), jnp.float32))
    # n=400 << _TILE_C: the whole scene is ONE tile, so its full y extent
    # must fit the 16-row window — keep y tight (at production N each tile
    # holds 1536 neighbors spanning 1-3 rows).
    x = np.asarray(0.40 + 0.2 * rng.random((3, n)), np.float32)
    x[1] = 0.45 + 0.35 * (x[1] - 0.40)
    x = jnp.asarray(x)
    perm, _ = mpm.sort_perm(cfg, (x[0], x[1], x[2]))
    state = MPMState(
        x=x[:, perm],
        v=jnp.asarray(0.1 * rng.standard_normal((3, n)), jnp.float32),
        C=jnp.asarray(0.05 * rng.standard_normal((3, 3, n)), jnp.float32),
        F=jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32)[:, :, None],
                                      (3, 3, n)).copy()))
    bodies = BodyState(pos=jnp.zeros((0, 3), jnp.float32),
                       quat=jnp.zeros((0, 4), jnp.float32),
                       v=jnp.zeros((0, 3), jnp.float32),
                       w=jnp.zeros((0, 3), jnp.float32))

    assert mpm._chunked_transfer_wanted(cfg, jnp.float32)
    s_c, _, aux = mpm.substep(cfg, params, (), state, bodies, 0,
                              assume_sorted=True)
    assert not bool(aux["window_overflow"])

    import unittest.mock as mock
    with mock.patch.object(mpm, "_fused_transfer_wanted",
                           lambda *a: False):
        s_d, _, _ = mpm.substep(cfg, params, (), state, bodies, 0)
    np.testing.assert_allclose(s_c.x, s_d.x, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(s_c.v, s_d.v, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(s_c.C, s_d.C, rtol=1e-3, atol=1e-3)


def test_chunked_grads_match_refs(fam):
    """Cotangents of every differentiable input — including the position
    rows that carry the in-kernel weight builds for ALL THREE axes — vs
    jax.grad of the truncation-aware XLA references."""
    cfg, x_vec, ps, W, WD, meta, v, C, stress, impulse = _setup(seed=3)
    rng = np.random.default_rng(4)
    gv = tuple(jnp.asarray(rng.standard_normal((WY * WZ, WX)), jnp.float32)
               for _ in range(3))
    chan = _chan(cfg, ps, v, C, stress, impulse)
    pv = _pv(ps)

    pm = jnp.asarray(rng.standard_normal((WY * WZ, WX)), jnp.float32)
    pmom = jnp.asarray(rng.standard_normal((WY * WZ, 3 * WX)), jnp.float32)

    def loss_p2g(fn, c):
        gm, gmom = fn(c, meta)
        return jnp.sum(gm * pm) + jnp.sum(gmom * pmom)

    g_k = jax.grad(lambda c: loss_p2g(fam.p2g, c))(chan)
    g_r = jax.grad(lambda c: loss_p2g(fam.p2g_ref, c))(chan)
    np.testing.assert_allclose(g_k, g_r, rtol=3e-3, atol=3e-3)

    pg = jnp.asarray(rng.standard_normal((16, N)), jnp.float32)
    args = (pv,) + gv

    def loss_g2p(fn, a):
        return jnp.sum(fn(*a, meta) * pg)

    g_k = jax.grad(lambda a: loss_g2p(fam.g2p, a))(args)
    g_r = jax.grad(lambda a: loss_g2p(fam.g2p_ref, a))(args)
    for a, b in zip(g_k, g_r):
        np.testing.assert_allclose(a, b, rtol=3e-3, atol=3e-3)

    pv3 = jnp.asarray(rng.standard_normal((3, N)), jnp.float32)
    g_k = jax.grad(lambda a: jnp.sum(fam.gather(*a, meta) * pv3))(args)
    g_r = jax.grad(lambda a: jnp.sum(fam.gather_ref(*a, meta) * pv3))(args)
    for a, b in zip(g_k, g_r):
        np.testing.assert_allclose(a, b, rtol=3e-3, atol=3e-3)

    vals8 = _vals8(jnp.asarray(rng.standard_normal((3, N)), jnp.float32), ps)
    ps_ = jnp.asarray(rng.standard_normal((WY * WZ, 3 * WX)), jnp.float32)
    g_k = jax.grad(lambda a: jnp.sum(fam.splat(a, meta) * ps_))(vals8)
    g_r = jax.grad(lambda a: jnp.sum(fam.splat_ref(a, meta) * ps_))(vals8)
    np.testing.assert_allclose(g_k, g_r, rtol=3e-3, atol=3e-3)


@pytest.mark.parametrize("window", [(48, 32, 16), (32, 24, 32)])
def test_other_window_geometries(monkeypatch, window):
    """The production chunked windows (pour 48x32x16, grip/hit 32x24x32)
    through p2g + g2p in interpret mode vs the dense path."""
    monkeypatch.setattr(pallas_chunked, "_INTERPRET", True)
    monkeypatch.setattr(pallas_chunked, "_TILE_C", 256)
    pallas_chunked.family.cache_clear()
    fam = pallas_chunked.family(window)
    wx, wy, wz = window
    n = 700
    rng = np.random.default_rng(11)
    cfg = MPMConfig(n_particles=n, n_grid=64, dt=1e-4,
                    substeps=19, active_window=window)
    x = (0.42 + 0.16 * rng.random((3, n))).astype(np.float32)
    x = x[:, np.argsort(np.floor(x[1] * cfg.inv_dx - 0.5))]
    x_vec = tuple(jnp.asarray(x[d]) for d in range(3))
    sizes, corner, _ = mpm.window_geometry(cfg, x_vec)
    W, WD = mpm.axis_weights(cfg, x_vec, sizes, corner)
    ps = tuple(x_vec[d] * cfg.inv_dx for d in range(3))
    meta, ovf = pallas_chunked.chunk_meta(ps[1], corner, wy)
    assert not bool(ovf)
    v = tuple(jnp.asarray(rng.standard_normal(n), jnp.float32)
              for _ in range(3))
    C = tuple(tuple(jnp.asarray(0.1 * rng.standard_normal(n), jnp.float32)
                    for _ in range(3)) for _ in range(3))
    stress = tuple(tuple(jnp.asarray(rng.standard_normal(n), jnp.float32)
                         for _ in range(3)) for _ in range(3))
    impulse = tuple(jnp.asarray(1e-3 * rng.standard_normal(n), jnp.float32)
                    for _ in range(3))
    Hyz, HyzDy, HyzDz = mpm.hyz_family(cfg, W, WD)

    chan = (mpm._p2g_channels(cfg, v, C, stress, impulse)
            .at[13].set(ps[0]).at[14].set(ps[1]).at[15].set(ps[2]))
    ref = mpm.p2g_dense(cfg, W, WD, Hyz, HyzDy, HyzDz, v, C, stress, impulse)
    gm, gmom = fam.p2g(chan, meta)
    np.testing.assert_allclose(gm, ref[0], rtol=2e-3, atol=2e-3)
    for d in range(3):
        np.testing.assert_allclose(gmom[:, d * wx:(d + 1) * wx], ref[1 + d],
                                   rtol=2e-3, atol=2e-3)

    gv = tuple(jnp.asarray(rng.standard_normal((wy * wz, wx)), jnp.float32)
               for _ in range(3))
    pv = (jnp.zeros((8, n), jnp.float32)
          .at[0].set(ps[0]).at[1].set(ps[1]).at[2].set(ps[2]))
    v_ref, C_ref, _ = mpm.g2p_dense(cfg, W, WD, Hyz, HyzDy, HyzDz, gv, v)
    out = fam.g2p(pv, *gv, meta)
    for d in range(3):
        np.testing.assert_allclose(out[d], v_ref[d], rtol=2e-3, atol=2e-3)
    pallas_chunked.family.cache_clear()


def test_p2g_chunked_vmap_batches(fam):
    """jax.vmap over the chunked kernels (fwd AND custom_vjp bwd): the
    batched multi-trajectory rollout (env.batched_rollout*) vmaps the env
    step, which on TPU contains these pallas_calls — the pallas batching
    rule must lift them to an extra grid dim without changing results.
    Both operands carry the batch dim with DISTINCT per-batch values
    (per-trajectory positions produce per-trajectory meta in production)."""
    setups = [_setup(seed=5), _setup(seed=9)]
    chans, metas, singles, grads = [], [], [], []

    def lossf(c, m):
        gm, gmom = fam.p2g(c, m)
        return jnp.sum(gm ** 2) + jnp.sum(gmom ** 2)

    for cfg, x_vec, ps, W, WD, meta, v, C, stress, impulse in setups:
        chan = _chan(cfg, ps, v, C, stress, impulse)
        chans.append(chan); metas.append(meta)
        singles.append(fam.p2g(chan, meta))
        grads.append(jax.grad(lossf)(chan, meta))

    chan_b, meta_b = jnp.stack(chans), jnp.stack(metas)
    gm_v, gmom_v = jax.vmap(fam.p2g)(chan_b, meta_b)
    gv = jax.vmap(jax.grad(lossf))(chan_b, meta_b)
    for b in range(2):
        np.testing.assert_allclose(gm_v[b], singles[b][0],
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(gmom_v[b], singles[b][1],
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(gv[b], grads[b], rtol=1e-6, atol=1e-8)


def test_g2p_gather_splat_vmap_batch(fam):
    """vmap batching over the remaining chunked kernels (g2p / gather /
    splat), fwd and bwd, with meta batched alongside (it derives from
    per-trajectory positions in production) — completes the
    batched-rollout kernel coverage."""
    cases = []
    for seed in (6, 10):
        cfg, x_vec, ps, W, WD, meta, v, C, stress, impulse = _setup(seed=seed)
        rng = np.random.default_rng(seed + 1)
        gv = tuple(jnp.asarray(rng.standard_normal((WY * WZ, WX)),
                               jnp.float32) for _ in range(3))
        pv = _pv(ps)
        vals8 = _vals8(jnp.asarray(rng.standard_normal((3, N)), jnp.float32),
                       ps)
        cases.append((meta, (pv, *gv), (vals8,)))

    for fn, pick in ((fam.g2p, 1), (fam.gather, 1), (fam.splat, 2)):
        metas = jnp.stack([c[0] for c in cases])
        args_by_case = [c[pick] for c in cases]
        ab = tuple(jnp.stack([args_by_case[0][i], args_by_case[1][i]])
                   for i in range(len(args_by_case[0])))

        def lossf(m, *a):
            out = fn(*a, m)
            return sum(jnp.sum(l ** 2)
                       for l in jax.tree_util.tree_leaves(out))

        singles = [fn(*args_by_case[b], cases[b][0]) for b in range(2)]
        grads = [jax.grad(lossf, argnums=tuple(range(1, 1 + len(ab))))(
            cases[b][0], *args_by_case[b]) for b in range(2)]
        out = jax.vmap(lambda m, *a: fn(*a, m))(metas, *ab)
        gvv = jax.vmap(jax.grad(
            lossf, argnums=tuple(range(1, 1 + len(ab)))))(metas, *ab)
        for b in range(2):
            for lo, lv in zip(jax.tree_util.tree_leaves(singles[b]),
                              jax.tree_util.tree_leaves(out)):
                np.testing.assert_allclose(np.asarray(lv)[b],
                                           np.asarray(lo),
                                           rtol=1e-6, atol=1e-7)
            for lo, lv in zip(jax.tree_util.tree_leaves(grads[b]),
                              jax.tree_util.tree_leaves(gvv)):
                np.testing.assert_allclose(np.asarray(lv)[b],
                                           np.asarray(lo),
                                           rtol=1e-6, atol=1e-7)


def test_chunk_meta_overflow_on_wide_tiles():
    """A tile whose particles span more than the 16-row y-window must raise
    the overflow flag (the contract that makes big SOFTMAC_TPU_TILE_C
    values safe to *try*: bench asserts on the flag; see CLAUDE.md)."""
    import jax.numpy as jnp
    from softmac_tpu.ops import pallas_chunked as pcc

    wy = 32
    corner = (jnp.int32(0), jnp.int32(4), jnp.int32(0))
    # 1536 scaled y positions spanning ~20 grid rows -> one tile, > _WY
    py = jnp.linspace(5.0, 24.0, pcc._TILE_C)
    _, ovf = pcc.chunk_meta(py, corner, wy)
    assert bool(ovf)
    # and a narrow span does not overflow
    py2 = jnp.linspace(8.0, 14.0, pcc._TILE_C)
    _, ovf2 = pcc.chunk_meta(py2, corner, wy)
    assert not bool(ovf2)
