"""EXPERIMENT (forward-only prototype): one fused Pallas kernel for the
whole CONTACT_MIXED grid stage — gather (grid->particle velocity) +
chained per-prim forecast contact + alpha=2 correction splat — replacing
the production 4-pass sequence [gather kernel, 2x (XLA row gather + k1 +
k2), splat kernel].

Wins over the sequence: the H-slab is built ONCE (not twice), the
(3, N) v_tmp and dv arrays never round-trip HBM, two kernel launches
disappear. The SDF stencil-row gathers STAY in XLA (random access).
Outputs: correction-splat A/B accumulators + per-particle wrench
contribution rows (XLA reduces) — NO (3, N) velocity outputs at all.

Parity + timing harness: builds the flagship pour scene (2 prims), forms
grid_v_mixed exactly as mpm.substep does, then compares the production
sequence vs the fused kernel (correction grid + wrenches) and times both
in-process over a 50-iteration varying-input scan.

Status: forward only. If the measured win justifies it, round 4 wires it
into mpm.substep with a hand-VJP backward composing the existing
gather-bwd / k1b / k2b / splat-bwd maths (CLAUDE.md design sketch).
Run: SOFTMAC_TPU_TILE_C=2048 python scripts/experiment_fused_mixed.py
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

os.environ.setdefault("SOFTMAC_TPU_TILE_C", "2048")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from softmac_tpu import SoftMacEnv, load
    from softmac_tpu.engine import contact as contact_mod
    from softmac_tpu.engine import mpm
    from softmac_tpu.ops import m33
    from softmac_tpu.ops import pallas_chunked as pcc
    from softmac_tpu.ops import pallas_contact as pc
    from softmac_tpu.ops.pallas_chunked import (
        _TILE_C, _WY, _pad_tile, _combine_ab, _waxis, _wy16)
    from softmac_tpu.ops.pallas_fused import _dot00, _dot_t

    # ------------------------------------------------------------------
    # scene (flagship): 1e5 particles, pour config, window (32, 32, 16)
    # ------------------------------------------------------------------
    root = Path(__file__).resolve().parents[1]
    cfg = load(str(root / "softmac_tpu/config/demo_pour_config.py"))
    cfg.defrost(); cfg.TPU.active_window = (32, 32, 16); cfg.freeze()
    base_state = np.load(root / "envs/pour/pour_mpm_init_state_corotated.npy")
    reps = int(np.ceil(1e5 / base_state.shape[0]))
    rng = np.random.RandomState(0)
    tiled = np.tile(base_state[:, :3], (reps, 1))[:100_000]
    tiled += rng.randn(100_000, 3) * 1e-4 + np.array([0.0, 0.04, 0.0])
    tiled = tiled[np.argsort(np.floor(tiled[:, 1] * 64.0 - 0.5))]
    env = SoftMacEnv(cfg, init_particles=tiled)
    env.reset()
    mcfg = env.mpm_cfg
    params = env.mpm_params
    prims = env.prims
    _, bodies, _ = env._initial_carry()
    window = tuple(mcfg.active_window)
    wx, wy, wz = window
    N = env.n_particles
    dt, p_mass = mcfg.dt, mcfg.p_mass
    life = 1.0
    push_cap = mcfg.contact_push_velocity_cap

    x0 = jnp.asarray(tiled.T, jnp.float32)
    v0 = jnp.zeros((3, N), jnp.float32) \
        .at[1].set(-0.3) .at[0].set(0.05)

    # ------------------------------------------------------------------
    # fused kernel
    # ------------------------------------------------------------------
    res1, res2 = prims[0].res, prims[1].res

    def make_kernel(res1, res2, dt, p_mass):
        def kernel(meta_ref, pv_ref, rows1_ref, rows2_ref, par1_ref,
                   par2_ref, gvpa_ref, gvpb_ref,
                   oa_ref, ob_ref, wr_ref, h_ref, r_ref):
            t = pl.program_id(0)

            @pl.when(meta_ref[1, t] == 1)
            def _():
                oa_ref[:] = jnp.zeros_like(oa_ref)
                ob_ref[:] = jnp.zeros_like(ob_ref)

            n_z = gvpa_ref.shape[0] // 8
            wx = gvpa_ref.shape[1] // 3
            half = (_WY // 2) * n_z
            Wx, _ = _waxis(pv_ref[0:1, :], meta_ref[4, t].astype(jnp.float32),
                           wx)
            Wy, _ = _wy16(pv_ref[1:2, :], meta_ref[2, t].astype(jnp.float32))
            Wz, _ = _waxis(pv_ref[2:3, :], meta_ref[5, t].astype(jnp.float32),
                           n_z)
            for y in range(_WY):
                h_ref[y * n_z:(y + 1) * n_z, :] = Wy[y:y + 1, :] * Wz

            # gather: grid velocity at particles (v_tmp)
            gvp = jnp.concatenate([gvpa_ref[:], gvpb_ref[:]], axis=0)
            M_all = _dot00(gvp, h_ref[:])                 # (3*wx, T)
            vt = [jnp.sum(Wx * M_all[d * wx:(d + 1) * wx], axis=0,
                          keepdims=True) for d in range(3)]
            v_tmp = jnp.concatenate(vt, axis=0)           # (3, T)

            xw = pv_ref[3:6, :]                           # world positions
            zeros2 = jnp.zeros_like(v_tmp[0:2, :])

            # chained per-prim forecast contact (k1 + k2 math, in place)
            def prim_pass(rows, par, res, v_in):
                s, nd = pc._par_unpack(par)
                xv = jnp.concatenate([xw, v_in, zeros2], axis=0)
                st1 = pc._mixed1_math(rows, xv, s, nd, res, dt)
                out2 = pc._mixed2_math(rows, xv, st1, s, nd, res, dt,
                                       p_mass)
                mask = st1[6:7, :] <= pc.CONTACT_THRESHOLD
                v_out = out2[0:3, :]
                b_f = jnp.where(mask, out2[3:6, :], 0.0)
                bp = (s[0][0], s[0][1], s[0][2])
                r = m33.vsub((xw[0:1, :], xw[1:2, :], xw[2:3, :]), bp)
                b_t = m33.cross(r, (b_f[0:1, :], b_f[1:2, :], b_f[2:3, :]))
                return v_out, jnp.concatenate(
                    [b_f, b_t[0], b_t[1], b_t[2]], axis=0)   # (6, T)

            v1, w1 = prim_pass(rows1_ref[:], par1_ref[:], res1, v_tmp)
            v2, w2 = prim_pass(rows2_ref[:], par2_ref[:], res2, v1)

            wr_ref[0:6, :] = w1
            wr_ref[6:12, :] = w2
            wr_ref[12:16, :] = jnp.zeros_like(wr_ref[12:16, :])

            # correction splat: -alpha * (v_tmp - v_tgt)
            dv = v_tmp - v2
            for d in range(3):
                r_ref[d * wx:(d + 1) * wx, :] = Wx * (-2.0 * dv[d:d + 1, :])
            o = _dot_t(h_ref[:], r_ref[:])
            oa_ref[:] += o[:half]
            ob_ref[:] += o[half:]
        return kernel

    kernel = make_kernel(res1, res2, dt, p_mass)

    def fused_stage(pv8, rows1, rows2, par1, par2, gv, meta):
        """pv8: (8, N) [scaled xyz | world xyz | 0 | 0]; rows*: (32, N);
        gv: (wy*wz, 3*wx) grid_v_mixed. Returns (corr (wy*wz, 3wx),
        wrench (2, 6))."""
        tile = _TILE_C
        (pv8, rows1, rows2), n_pad = _pad_tile([pv8, rows1, rows2], N)

        def lane(rows):
            return pl.BlockSpec((rows, tile), lambda i, m: (0, i),
                                memory_space=pltpu.VMEM)

        def par_spec():
            return pl.BlockSpec((1, 128), lambda i, m: (0, 0),
                                memory_space=pltpu.VMEM)

        def grid_a(cols):
            return pl.BlockSpec((8 * wz, cols), lambda i, m: (m[0, i], 0),
                                memory_space=pltpu.VMEM)

        def grid_b(cols):
            return pl.BlockSpec((8 * wz, cols), lambda i, m: (m[0, i] + 1, 0),
                                memory_space=pltpu.VMEM)

        slab = pltpu.VMEM((_WY * wz, tile), jnp.float32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // tile,),
            in_specs=[lane(8), lane(32), lane(32), par_spec(), par_spec(),
                      grid_a(3 * wx), grid_b(3 * wx)],
            out_specs=[grid_a(3 * wx), grid_b(3 * wx), lane(16)],
            scratch_shapes=[slab, pltpu.VMEM((3 * wx, tile), jnp.float32)],
        )
        oa, ob, wr = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((wy * wz, 3 * wx), jnp.float32),
                       jax.ShapeDtypeStruct((wy * wz, 3 * wx), jnp.float32),
                       jax.ShapeDtypeStruct((16, n_pad), jnp.float32)],
            interpret=False,
        )(meta, pv8, rows1, rows2, par1, par2, gv, gv)
        corr = _combine_ab(oa, ob, meta, wy, wz)
        wr = wr[:, :N]
        wrench = jnp.stack([jnp.sum(wr[0:6], axis=1),
                            jnp.sum(wr[6:12], axis=1)])
        return corr, wrench

    # ------------------------------------------------------------------
    # shared scene plumbing (both pipelines start from grid_v_mixed)
    # ------------------------------------------------------------------
    def common(x, v):
        sizes, corner, _ovf = mpm.window_geometry(mcfg, x, None)
        px, py, pz = (x[d] * mcfg.inv_dx for d in range(3))
        meta, _ = pcc.chunk_meta(py, corner, sizes[1])
        pv = jnp.zeros((8, N), jnp.float32) \
            .at[0].set(px).at[1].set(py).at[2].set(pz)
        # a mass/momentum P2G to get a realistic grid (production path)
        C = tuple(tuple(jnp.zeros((N,), jnp.float32) for _ in range(3))
                  for _ in range(3))
        stress = C
        chan = mpm._p2g_channels(mcfg, v, C, stress, (0.0 * x[0],) * 3) \
            .at[13].set(px).at[14].set(py).at[15].set(pz)
        fam = pcc.family(sizes)
        gm, gmom = fam.p2g(chan, meta)
        grid = (gm, gmom[:, :sizes[0]], gmom[:, sizes[0]:2 * sizes[0]],
                gmom[:, 2 * sizes[0]:])
        coords = mpm.grid_coords(mcfg, sizes, corner)
        g_v, mask, _gm = mpm.grid_normalize(mcfg, grid, params.gravity)
        gvm = mpm.boundary_condition(mcfg, coords, g_v)
        return sizes, corner, meta, pv, mask, gvm

    def prim_inputs(x, i):
        prim = prims[i]
        bp = tuple(bodies.pos[i])
        bq = tuple(bodies.quat[i])
        qinv = m33.qnorm(m33.qconj(bq))
        p_loc = m33.qrot(qinv, m33.vsub(x, bp))
        rows = prim.neighborhood.T[:, pc._cell_index(prim, p_loc)]
        par = pc._pack_par(prim, bodies.pos[i], bodies.quat[i], bodies.v[i],
                           bodies.w[i], params.friction[i],
                           params.softness[i], jnp.float32(life), push_cap)
        return rows, par

    def production(x, v):
        sizes, corner, meta, pv, mask, gvm = common(x, v)
        vt = fam_gather(sizes, pv, gvm, meta)
        v_tgt = vt
        wrenches = []
        for i in range(2):
            v_tgt, wr = contact_mod.collide_mixed(
                prims[i], bodies.pos[i], bodies.quat[i], bodies.v[i],
                bodies.w[i], params.friction[i], params.softness[i],
                (x[0], x[1], x[2]), v_tgt, p_mass, dt, life,
                push_cap=push_cap)
            wrenches.append(wr)
        fam = pcc.family(sizes)
        dv = m33.vsub(vt, v_tgt)
        vals = jnp.concatenate(
            [jnp.stack([-2.0 * dv[d] for d in range(3)]),
             pv[0:3], pv[6:8]], axis=0)
        cg = fam.splat(vals, meta)
        return cg, jnp.stack(wrenches)

    def fam_gather(sizes, pv, gvm, meta):
        fam = pcc.family(sizes)
        out = fam.gather(pv, *gvm, meta)
        return (out[0], out[1], out[2])

    def fused(x, v):
        sizes, corner, meta, pv, mask, gvm = common(x, v)
        xw = jnp.stack([x[0], x[1], x[2]])
        pv8 = pv.at[3:6].set(xw)
        rows1, par1 = prim_inputs(x, 0)
        rows2, par2 = prim_inputs(x, 1)
        gv = jnp.concatenate(list(gvm), axis=1)
        corr, wrench = fused_stage(pv8, rows1, rows2, par1, par2, gv, meta)
        return corr, wrench

    # ------------------------------------------------------------------
    # parity
    # ------------------------------------------------------------------
    xt = (x0[0], x0[1], x0[2])
    vt_ = (v0[0], v0[1], v0[2])
    corr_p, wr_p = jax.jit(production)(xt, vt_)
    corr_f, wr_f = jax.jit(fused)(xt, vt_)
    corr_p, corr_f = np.asarray(corr_p), np.asarray(corr_f)
    wr_p, wr_f = np.asarray(wr_p), np.asarray(wr_f)
    err_c = np.abs(corr_p - corr_f).max()
    err_w = np.abs(wr_p - wr_f).max() / max(np.abs(wr_p).max(), 1e-12)
    print(f"parity: corr-grid max err {err_c:.3e}  wrench rel err "
          f"{err_w:.3e}  (wrench prod {wr_p[:, :3].round(4).tolist()})",
          flush=True)

    # ------------------------------------------------------------------
    # timing: 50-iter varying scan of JUST the mixed stage
    # ------------------------------------------------------------------
    def loop(stage):
        def f(x, v):
            def s(c, _):
                corr, wr = stage((c[0], c[1], c[2]), (v[0], v[1], v[2]))
                c = jnp.stack([c[0] + 1e-6 * jnp.sum(corr) + 1e-9 * wr[0, 0],
                               c[1], c[2]])
                return c, None
            c, _ = jax.lax.scan(s, x, None, length=50)
            return c
        return f

    for name, stage in [("production 4-pass", production),
                        ("fused one-pass", fused)]:
        jf = jax.jit(loop(stage))
        jax.block_until_ready(jf(x0, v0))
        ts = []
        for _ in range(5):
            t0 = time.time(); jax.block_until_ready(jf(x0, v0))
            ts.append(time.time() - t0)
        print(f"{name:20s} {1e3 * min(ts) / 50:7.3f} ms/substep (mixed "
              f"stage only, fwd)", flush=True)


if __name__ == "__main__":
    main()
