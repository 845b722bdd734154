"""Microbench each fused transfer kernel at 1e5 particles, window
(40, 32, 16): 100 iterations inside one jitted lax.scan (per-call RPC is
~29 ms through the tunnel), with the loop index folded into one input so
XLA cannot hoist the loop-invariant pallas call.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from softmac_tpu.ops import pallas_fused as pf

    n = 100_000
    wx, wy, wz = 40, 32, 16
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.float32)

    Wx, WxD = arr(wx, n), arr(wx, n)
    Wy, WDy = arr(wy, n), arr(wy, n)
    Wz, WDz = arr(wz, n), arr(wz, n)
    chan = arr(16, n)
    gv = [arr(wy * wz, wx) for _ in range(3)]
    g16 = arr(16, n)
    dgm, dgmom = arr(wy * wz, wx), arr(wy * wz, 3 * wx)
    vals = arr(3, n)
    dout = arr(wy * wz, 3 * wx)
    dv3 = arr(3, n)

    cases = {
        "p2g_fwd": lambda t: pf._p2g_pallas(Wx + t, WxD, Wy, WDy, Wz, WDz,
                                            chan),
        "p2g_bwd": lambda t: pf._p2g_bwd_pallas(Wx + t, WxD, Wy, WDy, Wz,
                                                WDz, chan, dgm, dgmom),
        "g2p_fwd": lambda t: pf._g2p_pallas(Wx + t, WxD, Wy, WDy, Wz, WDz,
                                            *gv),
        "g2p_bwd": lambda t: pf._g2p_bwd_pallas(Wx + t, WxD, Wy, WDy, Wz,
                                                WDz, *gv, g16),
        "gather_fwd": lambda t: pf._gather_pallas(Wx + t, Wy, Wz, *gv),
        "gather_bwd": lambda t: pf._gather_bwd_pallas(Wx + t, Wy, Wz, *gv,
                                                      dv3),
        "splat_fwd": lambda t: pf._splat_pallas(Wx + t, Wy, Wz, vals),
        "splat_bwd": lambda t: pf._splat_bwd_pallas(Wx + t, Wy, Wz, vals,
                                                    dout),
    }

    for name, fn in cases.items():
        @jax.jit
        def run(t0):
            def body(c, _):
                out = fn(c)
                leaves = jax.tree_util.tree_leaves(out)
                # fold a scalar of the output back into the carry
                return c + leaves[0].ravel()[0] * 1e-20, None
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
