"""Phase bisection at 1e5 particles on the FLAGSHIP physics (demo_pour:
CONTACT_MIXED vs the glass + bowl SDFs, corotated liquid): raw jitted
substep scans with pieces disabled, fwd and fwd+bwd, to locate the time.

Variants:
  full       — mixed contact vs both prims (the production substep)
  onecontact — same program, bowl contact off (isolates the per-prim cost)
  nocontact  — primitives_contact all False (transfer + stress + grid only)
  matonly    — JUST the deformation update + stress (no transfers/grid):
               the material phase in isolation (pour is corotated liquid,
               so no SVD — needs_svd=False)

contact cost  = full - nocontact;  per-prim cost = full - onecontact
transfer+grid = nocontact - matonly
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

SORTED = "--sorted" in sys.argv   # pre-sort by y-cell + assume_sorted=True
                                  # (the production rollout configuration)


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp
    from softmac_tpu import SoftMacEnv, load
    from softmac_tpu.engine import mpm
    from softmac_tpu.engine.materials import compute_stress_and_F, needs_svd
    from softmac_tpu.engine.svd3 import svd3_soa
    from softmac_tpu.engine.types import BodyState, MPMState
    from softmac_tpu.ops import m33

    root = Path(__file__).resolve().parents[1]
    cfg = load(str(root / "softmac_tpu/config/demo_pour_config.py"))
    cfg.defrost(); cfg.TPU.active_window = (32, 32, 16); cfg.freeze()

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
    packed = np.asarray(env.get_state())
    st = MPMState(
        x=jnp.asarray(packed[:, 0:3].T, jnp.float32),
        v=jnp.asarray(packed[:, 3:6].T, jnp.float32),
        C=jnp.asarray(packed[:, 6:15].T.reshape(3, 3, -1), jnp.float32),
        F=jnp.asarray(packed[:, 15:24].T.reshape(3, 3, -1), jnp.float32))
    # the env's real initial body states (glass around the liquid, bowl
    # below) so the contact pipeline touches realistic particle sets
    _, bodies, _ = env._initial_carry()

    nb = len(prims)
    variants = {
        "full": mcfg,
        "onecontact": dataclasses.replace(
            mcfg, primitives_contact=(True,) + (False,) * (nb - 1)),
        "nocontact": dataclasses.replace(
            mcfg, primitives_contact=(False,) * nb),
    }

    def timeit(fn, *args):
        out = jax.block_until_ready(fn(*args))
        times = []
        for _ in range(3):
            t0 = time.time(); jax.block_until_ready(fn(*args))
            times.append(time.time() - t0)
        return 1e3 * min(times) / 50, out

    for name, vcfg in variants.items():
        @jax.jit
        def run(s):
            def body(s, _):
                s, _, _ = mpm.substep(vcfg, params, prims, s, bodies, 0,
                                      assume_sorted=SORTED)
                return s, None
            s, _ = jax.lax.scan(body, s, None, length=50)
            return s

        @jax.jit
        def run_grad(s):
            def loss(s):
                def body(c, _):
                    c, _, _ = mpm.substep(vcfg, params, prims, c, bodies, 0,
                                          assume_sorted=SORTED)
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

        fwd_ms, _ = timeit(run, st)
        both_ms, _ = timeit(run_grad, st)
        print(f"{name:10s} fwd {fwd_ms:7.3f} ms/substep   "
              f"fwd+bwd {both_ms:7.3f} ms/substep", flush=True)

    # material phase in isolation: deformation update + stress only
    @jax.jit
    def run_mat(s):
        def body(s, _):
            C = tuple(tuple(s.C[i, j] for j in range(3)) for i in range(3))
            F = tuple(tuple(s.F[i, j] for j in range(3)) for i in range(3))
            F_tmp = m33.mmul(m33.madd_diag(m33.mscale(C, mcfg.dt), 1.0), F)
            if needs_svd(mcfg):
                U, sig, V = svd3_soa(F_tmp)
            else:
                U = sig = V = None
            stress, F_new = compute_stress_and_F(
                mcfg, F_tmp, U, sig, V, params.mu, params.lam,
                params.yield_stress)
            # fold the stress into the carry so nothing is DCE'd
            sC = tuple(tuple(s.C[i][j] + 1e-30 * stress[i][j]
                             for j in range(3)) for i in range(3))
            return MPMState(x=s.x, v=s.v, C=m33.to_mat_array(sC),
                            F=m33.to_mat_array(F_new)), None
        s, _ = jax.lax.scan(body, s, None, length=50)
        return s

    @jax.jit
    def run_mat_grad(s):
        def loss(s):
            c, _ = jax.lax.scan(
                lambda c, _: (run_mat_body(c), None), s, None, length=50)
            return jnp.sum(c.F)
        # reuse run_mat's body via closure
        def run_mat_body(s):
            C = tuple(tuple(s.C[i, j] for j in range(3)) for i in range(3))
            F = tuple(tuple(s.F[i, j] for j in range(3)) for i in range(3))
            F_tmp = m33.mmul(m33.madd_diag(m33.mscale(C, mcfg.dt), 1.0), F)
            if needs_svd(mcfg):
                U, sig, V = svd3_soa(F_tmp)
            else:
                U = sig = V = None
            stress, F_new = compute_stress_and_F(
                mcfg, F_tmp, U, sig, V, params.mu, params.lam,
                params.yield_stress)
            sC = tuple(tuple(s.C[i][j] + 1e-30 * stress[i][j]
                             for j in range(3)) for i in range(3))
            return MPMState(x=s.x, v=s.v, C=m33.to_mat_array(sC),
                            F=m33.to_mat_array(F_new))
        l, g = jax.value_and_grad(loss)(s)
        return l + sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(g))

    fwd_ms, _ = timeit(run_mat, st)
    both_ms, _ = timeit(run_mat_grad, st)
    print(f"{'matonly':10s} fwd {fwd_ms:7.3f} ms/substep   "
          f"fwd+bwd {both_ms:7.3f} ms/substep", flush=True)


if __name__ == "__main__":
    main()
