"""Fused mixed-contact kernels (ops/pallas_contact.py) vs the XLA
implementation, in Pallas interpret mode on CPU. Same f32 math modulo
association order -> tight tolerances."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from softmac_tpu.engine import contact as cm
from softmac_tpu.engine.sdf import sdf_params_from_bake
from softmac_tpu.ops import pallas_contact as pc

pytestmark = pytest.mark.skipif(not pc._HAS_PALLAS,
                                reason="pallas unavailable")


def _prim(res=10):
    """Synthetic sphere SDF bake (analytic, smooth)."""
    lower, upper = np.zeros(3), np.ones(3)
    dx = 1.0 / (res - 1)
    g = np.stack(np.meshgrid(*[np.linspace(0, 1, res)] * 3, indexing="ij"),
                 axis=-1)
    d = np.linalg.norm(g - 0.5, axis=-1) - 0.25
    n = (g - 0.5) / np.maximum(np.linalg.norm(g - 0.5, axis=-1,
                                              keepdims=True), 1e-9)
    bake = {"res": (res, res, res), "sdf": d, "normal": n,
            "position": (lower, upper), "dx": (dx, dx, dx)}
    return sdf_params_from_bake(bake, jnp.float32)


def _scene(n=600, seed=0):
    prim = _prim()
    rng = np.random.default_rng(seed)
    # mix of deep-contact, near-surface, and far/out-of-box particles
    x = tuple(jnp.asarray(-0.1 + 1.3 * rng.random(n), jnp.float32)
              for _ in range(3))
    v = tuple(jnp.asarray(0.5 * rng.standard_normal(n), jnp.float32)
              for _ in range(3))
    bp = jnp.asarray([0.02, -0.03, 0.01], jnp.float32)
    q = np.array([0.9, 0.1, -0.2, 0.15]); q /= np.linalg.norm(q)
    bq = jnp.asarray(q, jnp.float32)
    bv = jnp.asarray([0.1, -0.2, 0.05], jnp.float32)
    bw = jnp.asarray([0.3, 0.1, -0.2], jnp.float32)
    return prim, bp, bq, bv, bw, x, v


def _set_style(monkeypatch, style):
    """Select the contact-kernel family; all must match the XLA oracle.
    packed: single launch, sublane-packed channels (production default);
    rows:   single launch, legacy (1, T) lane rows;
    split:  legacy two-launch stage-1/stage-2 family."""
    monkeypatch.delenv("SOFTMAC_TPU_CONTACT_SPLIT", raising=False)
    monkeypatch.delenv("SOFTMAC_TPU_CONTACT_PACKED", raising=False)
    if style == "split":
        monkeypatch.setenv("SOFTMAC_TPU_CONTACT_SPLIT", "1")
    elif style == "rows":
        monkeypatch.setenv("SOFTMAC_TPU_CONTACT_PACKED", "0")
    pc._fused_factory.cache_clear()
    pc._fused12_factory.cache_clear()
    pc._particle_factory.cache_clear()


@pytest.mark.parametrize("style", ["packed", "rows", "split"])
@pytest.mark.parametrize("push_cap", [None, 2.0])
def test_fused_matches_xla(monkeypatch, push_cap, style):
    monkeypatch.setattr(pc, "_INTERPRET", True)
    _set_style(monkeypatch, style)
    prim, bp, bq, bv, bw, x, v = _scene()
    fr = jnp.float32(0.4)
    so = jnp.float32(666.0)
    kw = dict(p_mass=2e-4, dt=1e-4, push_cap=push_cap)

    pv_f, wr_f = pc.collide_mixed_fused(prim, bp, bq, bv, bw, fr, so, x, v,
                                        0.25, **kw)
    pv_x, wr_x = cm._collide_mixed_xla(prim, bp, bq, bv, bw, fr, so, x, v,
                                       0.25, **kw)
    for d in range(3):
        np.testing.assert_allclose(pv_f[d], pv_x[d], rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(wr_f, wr_x, rtol=5e-4, atol=1e-5)


@pytest.mark.parametrize("style", ["packed", "rows", "split"])
@pytest.mark.parametrize("push_cap", [None, 2.0])
def test_fused_grads_match_xla(monkeypatch, push_cap, style):
    """Cotangents of EVERY differentiable input (body state, friction,
    softness, particle state, life) from the hand-written backward kernels
    vs jax.vjp of the XLA implementation."""
    monkeypatch.setattr(pc, "_INTERPRET", True)
    _set_style(monkeypatch, style)
    prim, bp, bq, bv, bw, x, v = _scene(n=300, seed=3)
    kw = dict(p_mass=2e-4, dt=1e-4, push_cap=push_cap)
    rng = np.random.default_rng(4)
    px = tuple(jnp.asarray(rng.standard_normal(300), jnp.float32)
               for _ in range(3))
    pw = jnp.asarray(rng.standard_normal(6), jnp.float32)

    def loss(fn, args):
        bp_, bq_, bv_, bw_, fr_, so_, x_, v_, life_ = args
        pv, wr = fn(prim, bp_, bq_, bv_, bw_, fr_, so_, x_, v_, life_, **kw)
        return sum(jnp.sum(pv[d] * px[d]) for d in range(3)) + wr @ pw

    args = (bp, bq, bv, bw, jnp.float32(0.4), jnp.float32(666.0), x, v,
            jnp.float32(0.25))
    g_f = jax.grad(lambda a: loss(pc.collide_mixed_fused, a))(args)
    g_x = jax.grad(lambda a: loss(cm._collide_mixed_xla, a))(args)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_x)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a / scale, b / scale, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("style", ["packed", "rows"])
def test_particle_fused_matches_xla(monkeypatch, style):
    monkeypatch.setattr(pc, "_INTERPRET", True)
    _set_style(monkeypatch, style)
    prim, bp, bq, bv, bw, x, v = _scene(n=500, seed=7)
    fr = jnp.float32(0.4)
    kw = dict(p_mass=2e-4, dt=1e-4)

    imp_f, wr_f = pc.collide_particle_fused(prim, bp, bq, bv, bw, fr, x, v,
                                            **kw)
    imp_x, wr_x = cm._collide_particle_xla(prim, bp, bq, bv, bw, fr, x, v,
                                           **kw)
    for d in range(3):
        np.testing.assert_allclose(imp_f[d], imp_x[d], rtol=1e-4, atol=1e-9)
    np.testing.assert_allclose(wr_f, wr_x, rtol=5e-4, atol=1e-6)


@pytest.mark.parametrize("style", ["packed", "rows"])
def test_particle_fused_grads_match_xla(monkeypatch, style):
    """Cotangents of every differentiable input from the hand-written
    backward kernel vs jax.vjp of the XLA implementation."""
    monkeypatch.setattr(pc, "_INTERPRET", True)
    _set_style(monkeypatch, style)
    prim, bp, bq, bv, bw, x, v = _scene(n=300, seed=8)
    kw = dict(p_mass=2e-4, dt=1e-4)
    rng = np.random.default_rng(9)
    px = tuple(jnp.asarray(rng.standard_normal(300), jnp.float32)
               for _ in range(3))
    pw = jnp.asarray(rng.standard_normal(6), jnp.float32)

    def loss(fn, args):
        bp_, bq_, bv_, bw_, fr_, x_, v_ = args
        imp, wr = fn(prim, bp_, bq_, bv_, bw_, fr_, x_, v_, **kw)
        return sum(jnp.sum(imp[d] * px[d]) for d in range(3)) + wr @ pw

    args = (bp, bq, bv, bw, jnp.float32(0.4), x, v)
    g_f = jax.grad(lambda a: loss(pc.collide_particle_fused, a))(args)
    g_x = jax.grad(lambda a: loss(cm._collide_particle_xla, a))(args)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_x)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a / scale, b / scale, rtol=2e-3, atol=2e-3)


def _perturb_body(scene):
    """Distinct body state for the second batch entry (the _scene helper
    hardcodes bp/bq/bv/bw)."""
    prim, bp, bq, bv, bw, x, v = scene
    q = np.array([0.8, -0.15, 0.25, 0.1]); q /= np.linalg.norm(q)
    return (prim, bp + 0.04, jnp.asarray(q, jnp.float32),
            1.5 * bv + 0.02, -0.7 * bw, x, v)


def test_particle_fused_vmap_batches(monkeypatch):
    """jax.vmap over the fused particle-contact kernel (fwd + custom_vjp
    bwd): the batched multi-trajectory rollout vmaps the env step, which on
    TPU reaches this pallas_call — the batching rule must lift it to an
    extra grid dim without changing results. EVERY per-trajectory operand
    is batched (body state included: bodies evolve per trajectory in the
    production rollout), with DISTINCT values per batch entry."""
    monkeypatch.setattr(pc, "_INTERPRET", True)
    pc._particle_factory.cache_clear()
    scenes = [_scene(n=500, seed=12), _perturb_body(_scene(n=500, seed=14))]
    fr = jnp.float32(0.4)
    kw = dict(p_mass=2e-4, dt=1e-4)
    prim = scenes[0][0]

    def call(bp_, bq_, bv_, bw_, x_, v_):
        return pc.collide_particle_fused(prim, bp_, bq_, bv_, bw_, fr,
                                         x_, v_, **kw)

    def lossf(*args):
        imp, wr = call(*args)
        return sum(jnp.sum(imp[d] ** 2) for d in range(3)) + jnp.sum(wr ** 2)

    singles = [call(*s[1:]) for s in scenes]
    grads = [jax.grad(lossf, argnums=tuple(range(6)))(*s[1:])
             for s in scenes]
    batched_args = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                                scenes[0][1:], scenes[1][1:])
    out_v = jax.vmap(call)(*batched_args)
    gv = jax.vmap(jax.grad(lossf, argnums=tuple(range(6))))(*batched_args)
    for b in range(2):
        for lo, lv in zip(jax.tree_util.tree_leaves(singles[b]),
                          jax.tree_util.tree_leaves(out_v)):
            np.testing.assert_allclose(np.asarray(lv)[b], np.asarray(lo),
                                       rtol=1e-6, atol=1e-8)
        for lo, lv in zip(jax.tree_util.tree_leaves(grads[b]),
                          jax.tree_util.tree_leaves(gv)):
            # f32 association-order slack between the batched and
            # unbatched lowerings of the bwd kernel
            np.testing.assert_allclose(np.asarray(lv)[b], np.asarray(lo),
                                       rtol=1e-5, atol=1e-7)


def test_mixed_fused_vmap_batches(monkeypatch):
    """jax.vmap over the fused mixed-contact kernel (fwd + custom_vjp bwd):
    the door demo's --replicas robustification vmaps the env step on TPU,
    which reaches this pallas_call. Every per-trajectory operand is
    batched with distinct values (body state included)."""
    monkeypatch.setattr(pc, "_INTERPRET", True)
    pc._fused_factory.cache_clear()
    scenes = [_scene(n=500, seed=13), _perturb_body(_scene(n=500, seed=15))]
    fr, so = jnp.float32(0.4), jnp.float32(666.0)
    kw = dict(p_mass=2e-4, dt=1e-4, push_cap=None)
    prim = scenes[0][0]

    def call(bp_, bq_, bv_, bw_, x_, v_):
        return pc.collide_mixed_fused(prim, bp_, bq_, bv_, bw_, fr, so,
                                      x_, v_, 0.25, **kw)

    def lossf(*args):
        pv, wr = call(*args)
        return sum(jnp.sum(pv[d] ** 2) for d in range(3)) + jnp.sum(wr ** 2)

    singles = [call(*s[1:]) for s in scenes]
    grads = [jax.grad(lossf, argnums=tuple(range(6)))(*s[1:])
             for s in scenes]
    batched_args = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                                scenes[0][1:], scenes[1][1:])
    out_v = jax.vmap(call)(*batched_args)
    gv = jax.vmap(jax.grad(lossf, argnums=tuple(range(6))))(*batched_args)
    for b in range(2):
        for lo, lv in zip(jax.tree_util.tree_leaves(singles[b]),
                          jax.tree_util.tree_leaves(out_v)):
            np.testing.assert_allclose(np.asarray(lv)[b], np.asarray(lo),
                                       rtol=1e-6, atol=1e-8)
        for lo, lv in zip(jax.tree_util.tree_leaves(grads[b]),
                          jax.tree_util.tree_leaves(gv)):
            # f32 association-order slack between the batched and
            # unbatched lowerings of the bwd kernel
            np.testing.assert_allclose(np.asarray(lv)[b], np.asarray(lo),
                                       rtol=1e-5, atol=1e-7)
