"""TPU smoke + microbench for the fused contact kernels (fwd + bwd).

Compares against jax.vjp of the XLA implementation on-device, then times
both with the ops inside a lax.scan (per-call RPC latency through the
tunnel makes per-call timing meaningless — see CLAUDE.md)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

import softmac_tpu  # noqa: F401  (enables the persistent compilation cache)
from softmac_tpu.engine import contact as cm
from softmac_tpu.engine.sdf import sdf_params_from_bake
from softmac_tpu.ops import pallas_contact as pc


def _prim(res=64):
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


def main():
    n = 100_000
    prim = _prim()
    rng = np.random.default_rng(0)
    x = tuple(jnp.asarray(0.2 + 0.6 * rng.random(n), jnp.float32)
              for _ in range(3))
    v = tuple(jnp.asarray(0.5 * rng.standard_normal(n), jnp.float32)
              for _ in range(3))
    bp = jnp.asarray([0.02, -0.03, 0.01], jnp.float32)
    q = np.array([0.9, 0.1, -0.2, 0.15]); q /= np.linalg.norm(q)
    bq = jnp.asarray(q, jnp.float32)
    bv = jnp.asarray([0.1, -0.2, 0.05], jnp.float32)
    bw = jnp.asarray([0.3, 0.1, -0.2], jnp.float32)
    fr, so = jnp.float32(0.4), jnp.float32(666.0)
    kw = dict(p_mass=2e-4, dt=1e-4, push_cap=None)
    px = tuple(jnp.asarray(rng.standard_normal(n), jnp.float32)
               for _ in range(3))
    pw = jnp.asarray(rng.standard_normal(6), jnp.float32)

    def loss(fn, bp_, x_, v_):
        pv, wr = fn(prim, bp_, bq, bv, bw, fr, so, x_, v_, 0.25, **kw)
        return sum(jnp.sum(pv[d] * px[d]) for d in range(3)) + wr @ pw

    gf = jax.jit(jax.grad(lambda b, xx, vv: loss(
        lambda *a, **k: pc.collide_mixed_fused(*a, **k), b, xx, vv),
        argnums=(0, 1, 2)))
    gx = jax.jit(jax.grad(lambda b, xx, vv: loss(
        lambda *a, **k: cm._collide_mixed_xla(*a, **k), b, xx, vv),
        argnums=(0, 1, 2)))

    t0 = time.time()
    out_f = jax.block_until_ready(gf(bp, x, v))
    print(f"fused fwd+bwd compiled+ran in {time.time()-t0:.1f}s")
    out_x = jax.block_until_ready(gx(bp, x, v))
    worst = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(out_f),
                    jax.tree_util.tree_leaves(out_x)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        s = max(1.0, np.abs(b).max())
        worst = max(worst, float(np.abs(a - b).max() / s))
    print(f"max normalized grad err fused-vs-xla: {worst:.3e}")
    assert worst < 3e-3, worst

    # timing: K grad evals chained through a scan
    K = 50

    def timed(fn):
        def body(c, _):
            b_, x_, v_ = c
            gb, gxx, gvv = fn(b_, x_, v_)
            return (b_ + 1e-12 * gb,
                    tuple(x_[d] + 1e-12 * gxx[d] for d in range(3)),
                    tuple(v_[d] + 1e-12 * gvv[d] for d in range(3))), None

        run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=K)[0])
        c = (bp, x, v)
        jax.block_until_ready(run(c))
        t0 = time.time()
        jax.block_until_ready(run(c))
        return (time.time() - t0) / K * 1e3

    t_fused = timed(gf)
    t_xla = timed(gx)
    print(f"grad(loss(contact)) per call: fused {t_fused:.2f} ms, "
          f"xla {t_xla:.2f} ms")


if __name__ == "__main__":
    main()
