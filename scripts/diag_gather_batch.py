"""Probe (VERDICT r4 #3 candidate): batch BOTH primitives' (N, 32)
stencil-row gathers into ONE gather op — concat the transposed
neighborhood tables along columns, offset the second prim's indices, one
(32, 2N) gather, split. The gather is index-count-bound (~7 ns/index,
round-3 bisect: layout variants within noise), so the hypothesis is this
saves only per-op fixed overhead. Measures both forms in one process on
flagship-realistic shapes inside a scan (inputs advected so XLA cannot
hoist).

Run on TPU: python scripts/diag_gather_batch.py
"""
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from softmac_tpu.ops import m33
    from softmac_tpu.ops import pallas_contact as pc

    env = bench.build_headline_env()
    prims = env.prims
    _, bodies, _ = env._initial_carry()
    n = env.n_particles
    x0 = jnp.asarray(env.init_particles.T, jnp.float32)

    nbts = [p.neighborhood.T for p in prims]
    qinvs = [m33.qnorm(m33.qconj(tuple(bodies.quat[i])))
             for i in range(len(prims))]
    bps = [tuple(bodies.pos[i]) for i in range(len(prims))]

    nbt_cat = jnp.concatenate(nbts, axis=1)
    offsets = np.cumsum([0] + [p.neighborhood.shape[0] for p in prims[:-1]])

    def idx_for(i, x):
        p_loc = m33.qrot(qinvs[i], m33.vsub(x, bps[i]))
        return pc._cell_index(prims[i], p_loc)

    def separate(x):
        outs = []
        for i in range(len(prims)):
            rows = nbts[i][:, idx_for(i, x)]
            outs.append(rows)
        return outs

    def combined(x):
        idx = jnp.concatenate(
            [idx_for(i, x) + int(offsets[i]) for i in range(len(prims))])
        rows = nbt_cat[:, idx]
        return [rows[:, i * n:(i + 1) * n] for i in range(len(prims))]

    def scan50(body):
        def f(x):
            def s(c, _):
                outs = body((c[0], c[1], c[2]))
                drift = sum(o[0] for o in outs)
                c = jnp.stack([c[0] + 1e-6 * drift, c[1], c[2]])
                return c, None
            c, _ = jax.lax.scan(s, x, None, length=50)
            return c
        return jax.jit(f)

    for name, fn in (("separate (2 gathers)", separate),
                     ("combined (1 gather)", combined)):
        f = scan50(fn)
        jax.block_until_ready(f(x0))
        ts = []
        for _ in range(6):
            t0 = time.time()
            jax.block_until_ready(f(x0))
            ts.append(time.time() - t0)
        print(f"{name:22s} {1e3 * min(ts) / 50:7.3f} ms/iter "
              f"(median {1e3 * float(np.median(ts)) / 50:7.3f})", flush=True)


if __name__ == "__main__":
    main()
