"""SDF stencil-row gather layout shootout at 1e5 particles (the
mixed-contact cost floor: scripts/profile_contact.py measured the gather
at ~1.06 of the 1.16 ms/prim fwd pass). Honest harness: indices derive
from a carry that changes every scan iteration."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from softmac_tpu import SoftMacEnv, load
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
    prim = env.prims[0]
    _, bodies, _ = env._initial_carry()
    bpos, bquat = bodies.pos[0], bodies.quat[0]
    x0 = jnp.asarray(tiled.T, jnp.float32)

    nbt = prim.neighborhood.T            # (32, R)
    nb = prim.neighborhood               # (R, 32)
    nb16 = prim.neighborhood.astype(jnp.bfloat16)

    def idx_of(x):
        qinv = m33.qnorm(m33.qconj(tuple(bquat)))
        p_loc = m33.qrot(qinv, m33.vsub(x, tuple(bpos)))
        return pc._cell_index(prim, p_loc)

    variants = {
        # every variant consumes ALL gathered lanes (sum) so XLA cannot
        # narrow the gather to a single column
        "baseline col (32,R)[:,i]": lambda x: jnp.sum(nbt[:, idx_of(x)], 0),
        "row (R,32)[i]": lambda x: jnp.sum(nb[idx_of(x)], 1),
        "row + transpose": lambda x: jnp.sum(nb[idx_of(x)].T[:8], 0),
        "row bf16": lambda x: jnp.sum(nb16[idx_of(x)], 1).astype(jnp.float32),
        "idx only": lambda x: idx_of(x).astype(jnp.float32),
        "p_loc only": lambda x: m33.qrot(m33.qnorm(m33.qconj(tuple(bquat))),
                                         m33.vsub(x, tuple(bpos)))[1],
        "noop": lambda x: x[1],
    }

    def timeit(body):
        def f(x):
            def s(c, _):
                out = body((c[0], c[1], c[2]))
                c = jnp.stack([c[0], c[1] + 1e-6 * out, c[2]])
                return c, None
            c, _ = jax.lax.scan(s, x, None, length=50)
            return c
        jf = jax.jit(f)
        jax.block_until_ready(jf(x0))
        ts = []
        for _ in range(3):
            t0 = time.time(); jax.block_until_ready(jf(x0))
            ts.append(time.time() - t0)
        return 1e3 * min(ts) / 50

    for name, body in variants.items():
        print(f"{name:28s} {timeit(body):7.3f} ms/substep", flush=True)


if __name__ == "__main__":
    main()
