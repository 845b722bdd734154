"""Microbench each y-chunked transfer kernel (ops/pallas_chunked.py) at 1e5
SORTED particles, window (40, 32, 16) — same protocol as profile_kernels.py
(100 iterations inside one jitted lax.scan, loop index folded into an input).
Compare against the fused-family numbers to see what the 16-row windows buy
and what the dynamic-block A/B accumulation costs.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from softmac_tpu.ops import pallas_chunked as pc

    n = 100_000
    wx, wy, wz = 40, 32, 16
    rng = np.random.default_rng(0)

    # sorted scaled-y positions spanning rows [2, 28) of the window
    py = np.sort(2.5 + 25.0 * rng.random(n)).astype(np.float32)
    px = (2.0 + 36.0 * rng.random(n)).astype(np.float32)
    pz = (2.0 + 12.0 * rng.random(n)).astype(np.float32)
    meta, ovf = pc.chunk_meta(jnp.asarray(py),
                              (jnp.int32(0), jnp.int32(0), jnp.int32(0)), wy)
    assert not bool(ovf)
    fam = pc.family((wx, wy, wz))

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.float32)

    chan = (arr(16, n).at[13].set(jnp.asarray(px))
            .at[14].set(jnp.asarray(py)).at[15].set(jnp.asarray(pz)))
    pv = (jnp.zeros((8, n), jnp.float32).at[0].set(jnp.asarray(px))
          .at[1].set(jnp.asarray(py)).at[2].set(jnp.asarray(pz)))
    gv = [arr(wy * wz, wx) for _ in range(3)]
    g16 = arr(16, n)
    dgm, dgmom = arr(wy * wz, wx), arr(wy * wz, 3 * wx)
    vals = jnp.concatenate([arr(3, n), pv[0:3], jnp.zeros((2, n))], axis=0)
    dout = arr(wy * wz, 3 * wx)
    dv3 = arr(3, n)
    win = (wx, wy, wz)

    cases = {
        "p2g_fwd": lambda t: pc._p2g_c_pallas(chan + t * 1e-20, meta, win),
        "p2g_bwd": lambda t: pc._p2g_c_bwd_pallas(chan + t * 1e-20, meta,
                                                  win, dgm, dgmom),
        "g2p_fwd": lambda t: pc._g2p_c_pallas(pv + t * 1e-20, *gv, meta,
                                              win),
        "g2p_bwd": lambda t: pc._g2p_c_bwd_pallas(pv + t * 1e-20, *gv, meta,
                                                  win, g16),
        "gather_fwd": lambda t: pc._gather_c_pallas(pv + t * 1e-20, *gv,
                                                    meta, win),
        "gather_bwd": lambda t: pc._gather_c_bwd_pallas(pv + t * 1e-20, *gv,
                                                        meta, win, dv3),
        "splat_fwd": lambda t: pc._splat_c_pallas(vals + t * 1e-20, meta,
                                                  win),
        "splat_bwd": lambda t: pc._splat_c_bwd_pallas(vals + t * 1e-20, meta,
                                                      win, dout),
        "chunk_meta": lambda t: pc.chunk_meta(
            jnp.asarray(py) + t * 0.0,
            (jnp.int32(0), jnp.int32(0), jnp.int32(0)), wy),
        "sort_perm": lambda t: jnp.argsort(
            jnp.floor(jnp.asarray(py) + t * 0.0).astype(jnp.int32)),
    }

    for name, fn in cases.items():
        @jax.jit
        def run(t0):
            def body(c, _):
                out = fn(c)
                leaves = jax.tree_util.tree_leaves(out)
                return c + leaves[0].ravel()[0].astype(jnp.float32) * 1e-20, \
                    None
            c, _ = jax.lax.scan(body, t0, None, length=100)
            return c

        jax.block_until_ready(run(jnp.float32(0.0)))
        ts = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(run(jnp.float32(0.0)))
            ts.append(time.time() - t0)
        print(f"{name:12s} {1e3 * min(ts) / 100:7.3f} ms/call")


if __name__ == "__main__":
    main()
