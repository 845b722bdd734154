"""Measure the wx-scaling of the chunked transfer kernels — the x-chunking
ceiling experiment (VERDICT r3 #1).

Premise under test: "MXU dot columns are linear in wx, so x-chunked tiles
(per-tile narrow x-windows over (x,y)-sorted particles) would cut MXU work
like the y-chunks did." The counter-analysis: every kernel dot's
x-carrying dimension is C*wx lanes (C = 3 or 4); the MXU processes lane
tiles of 128, so cost floors at ceil(C*wx/128) tiles — at the flagship's
wx=32, 4*wx = 128 is EXACTLY one lane tile and 3*wx = 96 already pads to
128. An x-chunk below 32 saves nothing (pure padding); the lever only
exists for wx >= 48 windows.

This sweep measures every kernel at wx in {16, 24, 32, 48, 64} with the
same particle count / sort / y-z geometry. If ms/call flattens below
wx=32 while growing ~linearly above, the floor is confirmed and x-chunking
cannot beat the already-lane-exact wx=32 flagship window.

Run on TPU: python scripts/diag_xfloor.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def bench_window(wx, wy=32, wz=16, n=100_000):
    import jax
    import jax.numpy as jnp
    from softmac_tpu.ops import pallas_chunked as pc

    rng = np.random.default_rng(0)
    py = np.sort(2.5 + (wy - 7.0) * rng.random(n)).astype(np.float32)
    px = (2.0 + (wx - 4.0) * rng.random(n)).astype(np.float32)
    pz = (2.0 + (wz - 4.0) * rng.random(n)).astype(np.float32)
    meta, ovf = pc.chunk_meta(jnp.asarray(py),
                              (jnp.int32(0), jnp.int32(0), jnp.int32(0)), wy)
    assert not bool(ovf)

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
    }

    out = {}
    for name, fn in cases.items():
        @jax.jit
        def run(t0):
            def body(c, _):
                o = fn(c)
                leaves = jax.tree_util.tree_leaves(o)
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
        out[name] = 1e3 * min(ts) / 100
    return out


def main():
    wxs = [16, 24, 32, 48, 64]
    rows = {wx: bench_window(wx) for wx in wxs}
    names = list(next(iter(rows.values())).keys())
    print(f"{'kernel':12s}" + "".join(f"  wx={wx:<5d}" for wx in wxs)
          + "  (ms/call)")
    total = {wx: 0.0 for wx in wxs}
    for name in names:
        line = f"{name:12s}"
        for wx in wxs:
            line += f"  {rows[wx][name]:7.3f} "
            total[wx] += rows[wx][name]
        print(line)
    line = f"{'TOTAL':12s}"
    for wx in wxs:
        line += f"  {total[wx]:7.3f} "
    print(line)
    print("\nratios vs wx=32 (1.0 = no scaling):")
    for wx in wxs:
        print(f"  wx={wx}: {total[wx] / total[32]:.3f}")


if __name__ == "__main__":
    main()
