"""Phase bisection at 1e5 particles: raw jitted substep scans with pieces
disabled, fwd and fwd+bwd, to locate the remaining time.

Variants:
  full      — mixed contact vs the pour bottle SDF + rigid body states
  nocontact — same program, primitives_contact=(False,)
  nomat     — contact off AND elastic stress skipped (transfer cost only)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

SORTED = "--sorted" in sys.argv   # pre-sort by y-cell + assume_sorted=True
                                  # (the production rollout configuration)


def main():
    import jax
    import jax.numpy as jnp
    from softmac_tpu import SoftMacEnv, load
    from softmac_tpu.engine import mpm

    root = Path(__file__).resolve().parents[1]
    cfg = load(str(root / "softmac_tpu/config/demo_pour_vel_config.py"))
    cfg.defrost(); cfg.TPU.active_window = (40, 32, 16); cfg.freeze()

    base_state = np.load(root / "envs/pour/pour_mpm_init_state_corotated.npy")
    reps = int(np.ceil(1e5 / base_state.shape[0]))
    rng = np.random.RandomState(0)
    tiled = np.tile(base_state[:, :3], (reps, 1))[:100_000]
    tiled += rng.randn(100_000, 3) * 1e-4
    tiled += np.array([0.0, 0.04, 0.0])
    if SORTED:
        tiled = tiled[np.argsort(np.floor(tiled[:, 1] * 64.0 - 0.5))]
    env = SoftMacEnv(cfg, init_particles=tiled)
    env.reset()

    mcfg = env.mpm_cfg
    params = env.mpm_params
    prims = env.prims
    # build a fresh state via the env's packed IO (robust to carry layout)
    packed = np.asarray(env.get_state())
    from softmac_tpu.engine.types import MPMState
    st = MPMState(
        x=jnp.asarray(packed[:, 0:3].T, jnp.float32),
        v=jnp.asarray(packed[:, 3:6].T, jnp.float32),
        C=jnp.asarray(packed[:, 6:15].T.reshape(3, 3, -1), jnp.float32),
        F=jnp.asarray(packed[:, 15:24].T.reshape(3, 3, -1), jnp.float32))
    from softmac_tpu.engine.types import BodyState
    nb = len(prims)
    bodies = BodyState(
        pos=jnp.tile(jnp.asarray([[0.5, 0.4, 0.5]], jnp.float32), (nb, 1)),
        quat=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (nb, 1)),
        v=jnp.zeros((nb, 3), jnp.float32), w=jnp.zeros((nb, 3), jnp.float32))

    import dataclasses
    variants = {
        "full": mcfg,
        "nocontact": dataclasses.replace(
            mcfg, primitives_contact=(False,) * nb),
    }

    for name, vcfg in variants.items():
        @jax.jit
        def run(s):
            def body(s, _):
                s, _, _ = mpm.substep(vcfg, params, prims, s, bodies, 0, assume_sorted=SORTED)
                return s, None
            s, _ = jax.lax.scan(body, s, None, length=50)
            return s

        @jax.jit
        def run_grad(s):
            def loss(s):
                def body(c, _):
                    c, _, _ = mpm.substep(vcfg, params, prims, c, bodies, 0, assume_sorted=SORTED)
                    return c, None
                def blk(c, _):
                    c = jax.checkpoint(
                        lambda c: jax.lax.scan(body, c, None, length=10)[0])(c)
                    return c, None
                c, _ = jax.lax.scan(blk, s, None, length=5)
                return jnp.sum(c.x), c
            (l, c), g = jax.value_and_grad(loss, has_aux=True)(s)
            # consume every grad leaf so XLA cannot DCE the backward
            return l + sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(g))

        out = jax.block_until_ready(run(st))
        times = []
        for _ in range(3):
            t0 = time.time(); jax.block_until_ready(run(st))
            times.append(time.time() - t0)
        fwd_ms = 1e3 * min(times) / 50

        jax.block_until_ready(run_grad(st))
        times = []
        for _ in range(3):
            t0 = time.time(); jax.block_until_ready(run_grad(st))
            times.append(time.time() - t0)
        both_ms = 1e3 * min(times) / 50
        print(f"{name:10s} fwd {fwd_ms:7.3f} ms/substep   "
              f"fwd+bwd {both_ms:7.3f} ms/substep")


if __name__ == "__main__":
    main()
