"""Microbench the SDF-contact building blocks at 1e5 particles on the pour
bottle prim: the fused neighborhood row-gather (sample_sdf_normal_world),
full collide_mixed fwd and fwd+bwd, and raw row-gathers with random vs
sorted indices (does index locality change XLA's TPU gather cost?).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def bench(fn, iters=50):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(t0):
        def body(c, _):
            out = fn(c)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c + leaf.ravel()[0].astype(jnp.float32) * 1e-20, None
        c, _ = jax.lax.scan(body, t0, None, length=iters)
        return c

    jax.block_until_ready(run(jnp.float32(0.0)))
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(run(jnp.float32(0.0)))
        ts.append(time.time() - t0)
    return 1e3 * min(ts) / iters


def main():
    import jax
    import jax.numpy as jnp
    from softmac_tpu import SoftMacEnv, load
    from softmac_tpu.engine import contact, sdf

    root = Path(__file__).resolve().parents[1]
    cfg = load(str(root / "softmac_tpu/config/demo_pour_vel_config.py"))
    cfg.defrost(); cfg.TPU.active_window = (40, 32, 16); cfg.freeze()
    base_state = np.load(root / "envs/pour/pour_mpm_init_state_corotated.npy")
    reps = int(np.ceil(1e5 / base_state.shape[0]))
    rng = np.random.RandomState(0)
    tiled = np.tile(base_state[:, :3], (reps, 1))[:100_000]
    tiled += rng.randn(100_000, 3) * 1e-4
    env = SoftMacEnv(cfg, init_particles=tiled)
    env.reset()
    prim = env.prims[0]
    n = 100_000

    x = tuple(jnp.asarray(tiled[:, d], jnp.float32) for d in range(3))
    bp = jnp.asarray([0.5, 0.4, 0.5], jnp.float32)
    bq = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    bv = jnp.zeros(3, jnp.float32)
    bw = jnp.zeros(3, jnp.float32)
    pv = tuple(jnp.asarray(0.1 * rng.randn(n), jnp.float32) for _ in range(3))

    print(f"neighborhood table: {prim.neighborhood.shape} "
          f"{prim.neighborhood.dtype}")

    ms = bench(lambda t: sdf.sample_sdf_normal_world(
        prim, bp, bq, (x[0] + t * 0, x[1], x[2])))
    print(f"sample_sdf_normal_world fwd  {ms:7.3f} ms")

    def samp_grad(t):
        def f(x0):
            d, D = sdf.sample_sdf_normal_world(prim, bp, bq, (x0, x[1], x[2]))
            return jnp.sum(d) + sum(jnp.sum(c) for c in D)
        return jax.grad(f)(x[0] + t * 0)
    ms = bench(samp_grad)
    print(f"sample_sdf_normal_world grad {ms:7.3f} ms")

    ms = bench(lambda t: contact.collide_mixed(
        prim, bp, bq, bv, bw, jnp.float32(0.5), jnp.float32(666.0),
        (x[0] + t * 0, x[1], x[2]), pv, 1e-4, 1e-4, 0.05))
    print(f"collide_mixed fwd            {ms:7.3f} ms")

    def cm_grad(t):
        def f(v0):
            out, wr = contact.collide_mixed(
                prim, bp, bq, bv, bw, jnp.float32(0.5), jnp.float32(666.0),
                x, (v0, pv[1], pv[2]), 1e-4, 1e-4, 0.05)
            return sum(jnp.sum(c) for c in out) + jnp.sum(wr)
        return jax.grad(f)(pv[0] + t * 0)
    ms = bench(cm_grad)
    print(f"collide_mixed fwd+bwd        {ms:7.3f} ms")

    # raw row-gather cost: random vs sorted indices
    tbl = prim.neighborhood
    idx_rand = jnp.asarray(rng.randint(0, tbl.shape[0], n), jnp.int32)
    idx_sort = jnp.sort(idx_rand)
    ms = bench(lambda t: tbl[idx_rand + (t * 0).astype(jnp.int32)])
    print(f"row-gather 1e5 random idx    {ms:7.3f} ms")
    ms = bench(lambda t: tbl[idx_sort + (t * 0).astype(jnp.int32)])
    print(f"row-gather 1e5 sorted idx    {ms:7.3f} ms")


if __name__ == "__main__":
    main()
