"""Bisect the mixed-contact pass at 1e5 particles on the flagship scene:
time (a) the (N,32) stencil-row gather alone, (b) + stage-1 kernel,
(c) + stage-2 kernel, (d) the full collide_mixed (incl. wrench tail),
fwd and fwd+bwd — locates where the ~1 ms/prim contact cost lives.
Inputs vary per scan iteration (positions advected by v) so XLA cannot
hoist the work out of the loop."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from softmac_tpu import SoftMacEnv, load
    from softmac_tpu.engine import contact as contact_mod
    from softmac_tpu.ops import pallas_contact as pc
    from softmac_tpu.ops import m33

    root = Path(__file__).resolve().parents[1]
    cfg = load(str(root / "softmac_tpu/config/demo_pour_config.py"))
    cfg.defrost(); cfg.TPU.active_window = (32, 32, 16); cfg.freeze()
    base_state = np.load(root / "envs/pour/pour_mpm_init_state_corotated.npy")
    reps = int(np.ceil(1e5 / base_state.shape[0]))
    rng = np.random.RandomState(0)
    tiled = np.tile(base_state[:, :3], (reps, 1))[:100_000]
    tiled += rng.randn(100_000, 3) * 1e-4 + np.array([0.0, 0.04, 0.0])
    env = SoftMacEnv(cfg, init_particles=tiled)
    env.reset()
    prim = env.prims[0]                      # the glass
    _, bodies, _ = env._initial_carry()
    i = 0
    bpos, bquat = bodies.pos[i], bodies.quat[i]
    bv, bw = bodies.v[i], bodies.w[i]
    fric = env.mpm_params.friction[i]
    soft = env.mpm_params.softness[i]
    mcfg = env.mpm_cfg
    x0 = jnp.asarray(tiled.T, jnp.float32)
    v0 = jnp.full((3, 100_000), 1e-3, jnp.float32)

    def timeit(fn, *args):
        f = jax.jit(fn)
        jax.block_until_ready(f(*args))
        ts = []
        for _ in range(3):
            t0 = time.time(); jax.block_until_ready(f(*args))
            ts.append(time.time() - t0)
        return 1e3 * min(ts) / 50

    def scan50(body):
        """body(x, v) -> (3, N); carry advects so inputs vary."""
        def f(x, v):
            def s(c, _):
                out = body((c[0], c[1], c[2]), (v[0], v[1], v[2]))
                c = jnp.stack([c[d] + 1e-4 * out[d] for d in range(3)])
                return c, None
            c, _ = jax.lax.scan(s, x, None, length=50)
            return c
        return f

    par = pc._pack_par(prim, bpos, bquat, bv, bw, fric, soft,
                       jnp.float32(1.0), mcfg.contact_push_velocity_cap)
    nbt = prim.neighborhood.T
    res = prim.res
    k1 = pc._make_mixed1_kernel(res, mcfg.dt)
    k2 = pc._make_mixed2_kernel(res, mcfg.dt, mcfg.p_mass)

    def gather_only(x, v):
        qinv = m33.qnorm(m33.qconj(tuple(bquat)))
        p_loc = m33.qrot(qinv, m33.vsub(x, tuple(bpos)))
        rows1 = nbt[:, pc._cell_index(prim, p_loc)]
        return (rows1[0], rows1[1], rows1[2])

    def to_k1(x, v):
        n = x[0].shape[0]
        qinv = m33.qnorm(m33.qconj(tuple(bquat)))
        p_loc = m33.qrot(qinv, m33.vsub(x, tuple(bpos)))
        rows1 = nbt[:, pc._cell_index(prim, p_loc)]
        xv = jnp.concatenate([jnp.stack(list(x)), jnp.stack(list(v)),
                              jnp.zeros((2, n), jnp.float32)], axis=0)
        st1 = pc._run_kernel(k1, [rows1], [xv, par], n)
        return (st1[0], st1[1], st1[2])

    def to_k2(x, v):
        n = x[0].shape[0]
        qinv = m33.qnorm(m33.qconj(tuple(bquat)))
        p_loc = m33.qrot(qinv, m33.vsub(x, tuple(bpos)))
        rows1 = nbt[:, pc._cell_index(prim, p_loc)]
        xv = jnp.concatenate([jnp.stack(list(x)), jnp.stack(list(v)),
                              jnp.zeros((2, n), jnp.float32)], axis=0)
        st1 = pc._run_kernel(k1, [rows1], [xv, par], n)
        out2 = pc._run_kernel(k2, [rows1], [xv, st1, par], n)
        return (out2[0], out2[1], out2[2])

    def full(x, v):
        out, wr = contact_mod.collide_mixed(
            prim, bpos, bquat, bv, bw, fric, soft, x, v, mcfg.p_mass,
            mcfg.dt, 1.0, push_cap=mcfg.contact_push_velocity_cap)
        return (out[0] + wr[0], out[1], out[2])

    for name, fn in [("gather", gather_only), ("+k1", to_k1),
                     ("+k2", to_k2), ("full collide_mixed", full)]:
        ms = timeit(scan50(fn), x0, v0)
        print(f"{name:20s} {ms:7.3f} ms/substep(fwd)", flush=True)

    # fwd+bwd of the full pass
    def full_grad(x, v):
        def loss(x3):
            out, wr = contact_mod.collide_mixed(
                prim, bpos, bquat, bv, bw, fric, soft,
                (x3[0], x3[1], x3[2]), (v[0], v[1], v[2]), mcfg.p_mass,
                mcfg.dt, 1.0, push_cap=mcfg.contact_push_velocity_cap)
            return sum(jnp.sum(o) for o in out) + jnp.sum(wr)
        def s(c, _):
            l, g = jax.value_and_grad(loss)(c)
            return c + 1e-7 * g + 1e-12 * l, None
        def f(x, v):
            c, _ = jax.lax.scan(s, x, None, length=50)
            return c
        return f

    f = full_grad(x0, v0)
    jf = jax.jit(f)
    jax.block_until_ready(jf(x0, v0))
    ts = []
    for _ in range(3):
        t0 = time.time(); jax.block_until_ready(jf(x0, v0))
        ts.append(time.time() - t0)
    print(f"{'full fwd+bwd':20s} {1e3 * min(ts) / 50:7.3f} ms/substep",
          flush=True)


if __name__ == "__main__":
    main()
