"""Microbench particle-permutation strategies at 1e5 particles.

The env-step spatial sort (mpm.sort_perm/permute_state) gathers every
per-particle array along the MINOR (lane) axis — ~7 ns/element on TPU —
which measured ~45 ms/env-step of fwd+bwd machinery in bench.py (the whole
fused substep is ~19 ms). Candidates:

  A. minor-axis gather         a[:, perm]           (current)
  B. transpose-row-gather      a.T[perm].T          (rows are contiguous)
  C. variadic lax.sort         key + 28 payload rows through the network
  D. argsort alone             (the key build + sort, no payload)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = 100_000
    c = 28
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((c, n)), jnp.float32)
    key = jnp.asarray(rng.integers(0, 32, n), jnp.int32)

    def strat_a(t):
        perm = jnp.argsort(key + (t * 0).astype(jnp.int32))
        return a[:, perm]

    def strat_b(t):
        perm = jnp.argsort(key + (t * 0).astype(jnp.int32))
        return a.T[perm].T

    def strat_c(t):
        rows = [a[i] + t * 0 for i in range(c)]
        out = lax.sort((key,) + tuple(rows), num_keys=1)
        return jnp.stack(out[1:])

    def strat_d(t):
        return jnp.argsort(key + (t * 0).astype(jnp.int32))

    for name, fn in {"A_minor_gather": strat_a, "B_transpose_rows": strat_b,
                     "C_variadic_sort": strat_c, "D_argsort_only": strat_d,
                     }.items():
        @jax.jit
        def run(t0):
            def body(cr, _):
                out = fn(cr)
                return cr + jax.tree_util.tree_leaves(out)[0].ravel()[0]

            def body2(cr, _):
                out = fn(cr)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return cr + leaf.ravel()[0].astype(jnp.float32) * 1e-20, None
            cr, _ = jax.lax.scan(body2, t0, None, length=50)
            return cr

        jax.block_until_ready(run(jnp.float32(0.0)))
        ts = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(run(jnp.float32(0.0)))
            ts.append(time.time() - t0)
        print(f"{name:18s} {1e3 * min(ts) / 50:7.3f} ms/call")




def main_grad():
    import jax
    import jax.numpy as jnp

    n = 100_000
    c = 28
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((c, n)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((c, n)), jnp.float32)
    key = jnp.asarray(rng.integers(0, 32, n), jnp.int32)
    perm = jnp.argsort(key)
    inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(n, dtype=perm.dtype))

    def loss_minor(x, t):
        return jnp.sum(x[:, perm] * (w + t))

    def loss_roundtrip(x, t):
        y = x[:, perm] * (w + t)
        return jnp.sum(y[:, inv] * x)

    for name, fn in {"grad_minor_gather": loss_minor,
                     "grad_roundtrip": loss_roundtrip}.items():
        @jax.jit
        def run(t0):
            def body(cr, _):
                g = jax.grad(fn)(a, cr)
                return cr + g.ravel()[0] * 1e-20, None
            cr, _ = jax.lax.scan(body, t0, None, length=50)
            return cr

        jax.block_until_ready(run(jnp.float32(0.0)))
        ts = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(run(jnp.float32(0.0)))
            ts.append(time.time() - t0)
        print(f"{name:18s} {1e3 * min(ts) / 50:7.3f} ms/call")



if __name__ == "__main__":
    main()
    main_grad()
