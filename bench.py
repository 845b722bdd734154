"""Benchmark: forward+backward simulation substeps/sec at 1e5 particles
(the BASELINE.json north-star metric) on the FLAGSHIP pour scene — the
demo_pour workload (CONTACT_MIXED forecast contact + two force-controlled
floating rigid bodies stepped by RigidModel, reference
`softmac/config/demo_pour_config.py:16-29`, `mpm_simulator.py:396-443`) —
scaled to 1e5 particles. The previous rounds' pour_vel-physics number
(CONTACT_PARTICLE, velocity-controlled bodies) is kept as the secondary
`pour_vel` field.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

vs_baseline uses the documented Taichi-CPU estimate of 10 fwd+bwd
substeps/s at 1e5 particles (BASELINE.md) — the reference publishes no
numbers and Taichi cannot run here. A REAL measured comparison point is
included as vs_measured_torch_cpu: scripts/baseline_torch.py measured the
same pour hot loop in vectorized torch-CPU f64 autograd on this host at
0.367 fwd / 0.010 fwd+bwd substeps/s (single-core host; see BASELINE.md).

tpu_oracle_ok: on-hardware correctness gates against the NumPy f64 oracle
(tests/oracle.py) — the elastic transfer trio (dense/fused/chunked) AND
the coupled pour gate: the production rollout (sorted-carry chunked
kernels + fused mixed-contact kernels + floating rigid step) on a small
pour scene vs the independent coupled oracle, with mixed-contact particle
state and rigid q/qd error fields.

Roofline fields (`mfu`, `hbm_util`, ...): analytic per-substep FLOP and
HBM-byte accounting for the production kernel path (see `roofline()`),
reported against the attached chip's peaks.
"""
import dataclasses
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent / "tests"))

# chunked-kernel tile: auto-selected per scene (mpm.auto_chunk_tile — the
# 1e5-particle headline resolves to 2048, the measured-fastest safe tile;
# SOFTMAC_TPU_TILE_C still overrides for sweeps).

import numpy as np

ASSUMED_TAICHI_CPU_BASELINE = 10.0   # fwd+bwd substeps/s at 1e5 (estimate)
MEASURED_TORCH_CPU_FWDBWD = 0.010    # scripts/baseline_torch.py on this host
MEASURED_TORCH_CPU_FWD = 0.367

# TPU v5e (v5 lite) single-chip peaks (public spec):
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBPS = 819.0


def tpu_oracle_check():
    """Jitted substep on the default (accelerator) backend vs the NumPy f64
    oracle, 10 substeps, f32 tolerance. Catches layout/precision regressions
    the CPU-forced pytest suite cannot see."""
    import jax
    import jax.numpy as jnp
    from softmac_tpu.engine import mpm
    from softmac_tpu.engine.materials import lame_parameters
    from softmac_tpu.engine.types import (
        BodyState, MPMConfig, MPMParams, mpm_state_zero,
        MODEL_COROTATED, MAT_ELASTIC, CONTACT_GRID)
    from oracle import oracle_substep

    n = 512
    cfg = MPMConfig(n_particles=n, n_grid=32, dt=2e-4, substeps=1,
                    material_model=MODEL_COROTATED, ptype=MAT_ELASTIC,
                    collision_type=CONTACT_GRID, ground_friction=1.5,
                    n_primitives=0, n_controllers=0, primitives_contact=(),
                    enable_external_force=(), dtype=jnp.float32)
    mu, lam = lame_parameters(5e3, 0.2, MAT_ELASTIC)
    params = MPMParams(
        mu=jnp.full((n,), mu, jnp.float32), lam=jnp.full((n,), lam, jnp.float32),
        yield_stress=jnp.full((n,), 50.0, jnp.float32),
        gravity=jnp.asarray([0.0, -9.8, 0.0], jnp.float32),
        control_idx=jnp.full((n,), -1, jnp.int32),
        friction=jnp.zeros((1,), jnp.float32), softness=jnp.zeros((1,), jnp.float32))
    rng = np.random.RandomState(0)
    x0 = 0.4 + 0.2 * rng.rand(n, 3)
    state = mpm_state_zero(cfg, jnp.asarray(x0, jnp.float32))
    bodies = BodyState.identity(0, jnp.float32)

    @jax.jit
    def run(s):
        def body(s, _):
            s, _, _ = mpm.substep(cfg, params, (), s, bodies, 0)
            return s, None
        s, _ = jax.lax.scan(body, s, None, length=10)
        return s

    out = jax.block_until_ready(run(state))

    # same program through the fused Pallas transfer kernels (an active
    # window engages them; full-grid above runs the dense XLA path)
    cfg_w = dataclasses.replace(cfg, active_window=(24, 24, 24))

    @jax.jit
    def run_w(s):
        def body(s, _):
            s, _, _ = mpm.substep(cfg_w, params, (), s, bodies, 0)
            return s, None
        s, _ = jax.lax.scan(body, s, None, length=10)
        return s

    out_w = jax.block_until_ready(run_w(state))

    # same program again through the y-chunked sorted-carry family (the
    # production rollout path: wy >= 24 + assume_sorted engages
    # ops/pallas_chunked.py on TPU). Re-sorted every substep here so the
    # kernels' 16-row y-window assertion holds; per-particle params are
    # uniform in this scene, so only the state needs permuting. Unsorts via
    # a carried id map before comparing against the oracle.
    cfg_c = dataclasses.replace(cfg, active_window=(24, 32, 16))

    @jax.jit
    def run_c(s):
        def body(carry, _):
            s, ids = carry
            perm, _ = mpm.sort_perm(cfg_c, s.x)
            s = mpm.permute_state(s, perm)
            s, _, _ = mpm.substep(cfg_c, params, (), s, bodies, 0,
                                  assume_sorted=True)
            return (s, ids[perm]), None
        (s, ids), _ = jax.lax.scan(
            body, (s, jnp.arange(s.x.shape[1])), None, length=10)
        return mpm.permute_state(s, jnp.argsort(ids))

    out_c = jax.block_until_ready(run_c(state))

    x, v, C, F = x0.copy(), np.zeros((n, 3)), np.zeros((n, 3, 3)), \
        np.tile(np.eye(3), (n, 1, 1))
    for _ in range(10):
        x, v, C, F = oracle_substep(
            x, v, C, F, dt=2e-4, n_grid=32, mu=mu, lam=lam,
            gravity=(0.0, -9.8, 0.0), material_model=MODEL_COROTATED,
            ptype=MAT_ELASTIC, ground_friction=1.5)

    err_x = float(np.abs(np.asarray(out.x).T - x).max())
    err_v = float(np.abs(np.asarray(out.v).T - v).max())
    # fused-kernel tolerance: bf16x3 dots (~1e-3 rel, the production XLA
    # matmul precision class) vs the f64 oracle
    err_x_w = float(np.abs(np.asarray(out_w.x).T - x).max())
    err_v_w = float(np.abs(np.asarray(out_w.v).T - v).max())
    err_x_c = float(np.abs(np.asarray(out_c.x).T - x).max())
    err_v_c = float(np.abs(np.asarray(out_c.v).T - v).max())
    ok = bool(err_x < 1e-5 and err_v < 1e-4
              and err_x_w < 1e-4 and err_v_w < 2e-3
              and err_x_c < 1e-4 and err_v_c < 2e-3)
    info = {"err_x": err_x, "err_v": err_v,
            "err_x_fused": err_x_w, "err_v_fused": err_v_w,
            "err_x_chunked": err_x_c, "err_v_chunked": err_v_c}

    cok, cinfo = coupled_oracle_check()
    info.update(cinfo)
    return ok and cok, info


def coupled_oracle_check():
    """The FLAGSHIP-pipeline hardware gate: the production rollout (sorted
    carry + chunked transfer kernels + fused mixed-contact kernels +
    floating RigidModel step) on a small pour scene, executed on the
    attached accelerator, vs the independent NumPy f64 coupled oracle
    (tests/oracle.py: oracle_substep_mixed + oracle_floating_step).
    Reports mixed-contact particle errors AND rigid-state errors."""
    import jax
    from test_oracle_coupled import build_small_pour_env, run_oracle_env_steps

    env = build_small_pour_env(n=400, window=(48, 32, 16))
    n_steps = 4
    rng = np.random.RandomState(7)
    actions = rng.randn(n_steps, env.action_dim) * 0.05

    out = env.rollout(actions, loss_start_frame=0, loss_stride=n_steps)
    mpm_f, _, rigid_f = jax.block_until_ready(out["carry"])

    ox, ov, oq, oqd = run_oracle_env_steps(env, actions)
    err_x = float(np.abs(np.asarray(mpm_f.x, np.float64).T - ox).max())
    err_v = float(np.abs(np.asarray(mpm_f.v, np.float64).T - ov).max())
    err_q = float(np.abs(np.asarray(rigid_f.q, np.float64) - oq).max())
    err_qd = float(np.abs(np.asarray(rigid_f.qd, np.float64) - oqd).max())
    # measured on hardware: x 9.5e-8, v 4.2e-7, q 5.0e-8, qd 4.8e-6 —
    # gates at ~20x those (f32 + bf16x3 class), tight enough to catch a
    # real layout/precision regression
    ok = bool(err_x < 2e-6 and err_v < 1e-5
              and err_q < 2e-6 and err_qd < 1e-4)
    return ok, {"err_x_coupled": err_x, "err_v_coupled": err_v,
                "err_rigid_q": err_q, "err_rigid_qd": err_qd}


def cloth_oracle_check():
    """Cloth-family hardware gate: the engine's cloth-coupled substep
    (sticky forecast contact + penetration tracing) through the PRODUCTION
    sorted-carry chunked kernels on the attached accelerator, vs the
    independent NumPy f64 cloth oracle (tests/oracle.py; CPU twin:
    tests/test_oracle_cloth.py). Compares particle state, contact ids,
    penetration bits, and accumulated vertex contact forces."""
    import jax
    from test_oracle_cloth import (
        build_cloth_scene, run_engine_cloth_substeps,
        run_oracle_cloth_substeps)

    (cfg, params, cparams, state0, cloth_x, cloth_v, faces, nb, nd,
     x0) = build_cloth_scene(n=512, dtype=np.float32, window=(24, 32, 16))
    mu = float(params.mu[0]); lam = float(params.lam[0])

    s, pen_s, ext = run_engine_cloth_substeps(
        cfg, params, cparams, state0, cloth_x, cloth_v, n_sub=10,
        sorted_carry=True)
    ox, ov, ocid, open_, oext = run_oracle_cloth_substeps(
        cfg, x0, cloth_x, cloth_v, faces, nb, nd, mu, lam, n_sub=10)

    err_x = float(np.abs(np.asarray(s.x, np.float64).T - ox).max())
    err_v = float(np.abs(np.asarray(s.v, np.float64).T - ov).max())
    n_cid_mismatch = int((np.asarray(pen_s.contact_id) != ocid).sum())
    n_pen_mismatch = int((np.asarray(pen_s.penetration) != open_).sum())
    err_ext = float(np.abs(np.asarray(ext, np.float64) - oext).max())
    # f32 + bf16x3 transfer class vs f64 oracle; contact ids come from a
    # distance argmin so allow a few borderline flips out of 512
    ok = bool(err_x < 1e-4 and err_v < 2e-3 and err_ext < 2e-3
              and n_cid_mismatch <= 5 and n_pen_mismatch <= 5)
    return ok, {"err_x_cloth": err_x, "err_v_cloth": err_v,
                "err_ext_cloth": err_ext,
                "cloth_cid_mismatch": n_cid_mismatch,
                "cloth_pen_mismatch": n_pen_mismatch}


def build_taco_bench_env():
    """The cloth-family headline scene: the FLAGSHIP demo_taco config at its
    native 1e4 particles (plasticine cylinder + attachment-controlled
    tortilla cloth, sticky mixed contact, mpm_scale 5, 10 substeps/step —
    reference soft_cloth/config/demo_taco_config.py:14-28 with the substep
    semantics of soft_cloth/engine/mpm_simulator.py:418-428)."""
    from softmac_tpu import SoftMacEnv, load
    root = Path(__file__).resolve().parent
    cfg = load(str(root / "softmac_tpu/config/demo_taco_config.py"))
    env = SoftMacEnv(cfg)
    env.reset()
    return env


def _measure_cloth_env(env, steps=30, repeats=8):
    """Cloth twin of _measure_env: fwd+bwd substeps/s on the jitted
    remat='none' taco rollout (MPM substeps + contact-pair/penetration
    interleave + PD cloth solve per env step)."""
    import jax
    actions = np.zeros((steps, env.action_dim))
    out = env.rollout_and_grad(actions, loss_start_frame=0,
                               loss_stride=steps * env.substeps,
                               remat="none")
    jax.block_until_ready(out["loss"])  # compile + warmup
    times = []
    for _ in range(repeats):
        t0 = time.time()
        out = env.rollout_and_grad(actions, loss_start_frame=0,
                                   loss_stride=steps * env.substeps,
                                   remat="none")
        jax.block_until_ready(out["loss"])
        times.append(time.time() - t0)
    work = steps * env.substeps
    assert np.isfinite(float(out["loss"])), "cloth benchmark rollout diverged"
    assert not bool(out["terms"].get("window_overflow", False)), \
        "cloth active window overflowed"
    return work / min(times), work / float(np.median(times))


def batched_bench():
    """Batched multi-trajectory throughput (SURVEY 2.4 'batched rollouts
    map to vmap + DP'): B=8 independent pour_vel trajectories (5000
    particles each) rolled out fwd+bwd in ONE jitted vmap program.
    Returns aggregate substeps/s across the batch."""
    import jax
    from softmac_tpu import SoftMacEnv, load
    root = Path(__file__).resolve().parent
    cfg = load(str(root / "softmac_tpu/config/demo_pour_vel_config.py"))
    cfg.defrost(); cfg.TPU.active_window = (48, 32, 16); cfg.freeze()
    env = SoftMacEnv(cfg)
    env.reset()
    B, steps = 8, 50
    rng = np.random.RandomState(1)
    actions = rng.randn(B, steps, env.action_dim) * 1e-3
    out = env.batched_rollout_and_grad(actions, loss_start_frame=0,
                                       loss_stride=50)
    jax.block_until_ready(out["loss"])  # compile + warmup
    times = []
    for _ in range(3):
        t0 = time.time()
        out = env.batched_rollout_and_grad(actions, loss_start_frame=0,
                                           loss_stride=50)
        jax.block_until_ready(out["loss"])
        times.append(time.time() - t0)
    rate = B * steps * env.substeps / min(times)
    assert np.isfinite(np.asarray(out["loss"])).all()
    assert not bool(np.any(np.asarray(out["terms"]["window_overflow"]))), \
        "batched scene overflowed (tile/window vs blob span; see " \
        "mpm.auto_chunk_tile)"
    return {"B": B, "n_particles": env.n_particles,
            "substeps_per_s": round(rate, 1)}


def _tile_to_1e5(cfg_name, n=100_000):
    """Tile a packed init state to n particles with small jitter (fed
    through the constructor's init_particles path — same grid, physics,
    contact as the demo config)."""
    from softmac_tpu import load
    root = Path(__file__).resolve().parent
    cfg = load(str(root / f"softmac_tpu/config/{cfg_name}"))
    base_state = np.load(root / "envs/pour/pour_mpm_init_state_corotated.npy")
    reps = int(np.ceil(n / base_state.shape[0]))
    rng = np.random.RandomState(0)
    tiled = np.tile(base_state[:, :3], (reps, 1))[:n]
    tiled += rng.randn(n, 3) * 1e-4
    tiled += np.array([0.0, 0.04, 0.0])
    return cfg, tiled


def build_headline_env():
    """The headline-metric scene: the FLAGSHIP demo_pour config (mixed
    contact, two floating force-controlled rigid bodies) scaled to 1e5
    particles. Active window (32, 32, 16): sized to what the 50-step
    measurement scene covers — the rollout's window-overflow flag (asserted
    in _measure_env) proves coverage — and lane-aligned (4*wx = 128 = one
    lane tile; wx=48 wastes a half tile, wx=24 pads 96->128:
    scripts/diag_window.py measured 83.0 / 71.8 / 64.9 substeps/s for
    wx=32/48/24). The 3000-step demo keeps its own (48, 32, 16) travel
    window. Shared with scripts/diag_remat.py and scripts/profile_* so
    every measurement runs the SAME scene."""
    from softmac_tpu import SoftMacEnv
    cfg, tiled = _tile_to_1e5("demo_pour_config.py")
    cfg.defrost(); cfg.TPU.active_window = (32, 32, 16); cfg.freeze()
    env = SoftMacEnv(cfg, init_particles=tiled)
    env.reset()
    return env


def build_pour_vel_env():
    """The previous rounds' headline scene (pour_vel physics: particle
    contact + velocity-controlled bodies) at 1e5 — kept as the secondary
    metric for cross-round comparability."""
    from softmac_tpu import SoftMacEnv
    cfg, tiled = _tile_to_1e5("demo_pour_vel_config.py")
    cfg.defrost(); cfg.TPU.active_window = (40, 32, 16); cfg.freeze()
    env = SoftMacEnv(cfg, init_particles=tiled)
    env.reset()
    return env


def _measure_env(env, steps=100, repeats=8):
    """Best-of-repeats fwd+bwd substeps/s on a jitted remat='none' rollout
    (store-all tape; TPU A/B'd 1.24x over per-step checkpoint at short
    horizons — scripts/diag_remat.py). steps=100 amortizes the per-call
    dispatch overhead; the 8 repeats ride out the tunnel's slow phases
    (observed spread 41-109 substeps/s across identical calls —
    best-of-N measures the program, not the tunnel weather)."""
    import jax
    actions = np.zeros((steps, env.action_dim))
    out = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=steps,
                               remat="none")
    jax.block_until_ready(out["loss"])  # compile + warmup
    times = []
    for _ in range(repeats):
        t0 = time.time()
        out = env.rollout_and_grad(actions, loss_start_frame=0,
                                   loss_stride=steps, remat="none")
        jax.block_until_ready(out["loss"])
        times.append(time.time() - t0)
    work = steps * env.substeps
    rate_best = work / min(times)
    rate_median = work / float(np.median(times))
    assert np.isfinite(float(out["loss"])), "benchmark rollout diverged"
    assert not bool(out["terms"].get("window_overflow", False)), \
        "active window overflowed"
    return rate_best, rate_median


def roofline(n_particles, window, rate_fwd_bwd, tile_c=None):
    """Analytic per-substep FLOP / HBM-byte accounting for the production
    chunked-kernel path (ops/pallas_chunked.py), reported against the
    chip peaks.

    MXU model (shapes read off the kernels; T = tile, S = 16*wz slab rows,
    every _dot is bf16x3 = 3 MXU passes):
      fwd  dots per tile: p2g (S,T)@(T,10wx), g2p 3x(S,3wx)@(S,T),
           gather (S,3wx)@(S,T), splat (S,T)@(T,3wx)  -> R_fwd = 25*wx cols
      bwd  dots per tile: p2g dH 10wx + dR 10wx, g2p dgvp 9wx + dH 9wx,
           gather 3wx+3wx, splat 3wx+3wx              -> R_bwd = 50*wx cols
      executed flops/particle = 2 * S * R * 3 (bf16 passes), fwd resp. bwd;
      remat='none' runs fwd once + bwd once (no replay).

    HBM model (f32), per substep at N particles, both directions summed:
      particle slabs: p2g chan 16N, g2p out 16N, gather pv 8N + out 8N,
        splat vals 8N, state read+write 2*24N, SDF contact row gather 32N
        (+ the same again for the backward's cotangent slabs, ~0.8x);
      grid accumulators: p2g 3 A/B ref pairs (8*wz, {4,3,3}*wx) read+write
        per tile, splat 1 pair, g2p/gather read 1 pair each.
    The model is a LOWER bound (XLA fuses some slabs away, spills add
    traffic); its conclusion is robust at this distance from the peak.
    """
    wx, wy, wz = window
    T = int(tile_c) if tile_c else \
        int(os.environ.get("SOFTMAC_TPU_TILE_C", "1536"))
    S = 16 * wz
    n_tiles = -(-n_particles // T)

    r_fwd, r_bwd = 25 * wx, 50 * wx
    flops_mxu_fwd = 2 * S * r_fwd * 3 * n_particles
    flops_mxu_bwd = 2 * S * r_bwd * 3 * n_particles
    flops_mxu = flops_mxu_fwd + flops_mxu_bwd

    # VPU side work (slab builds, weight builds, per-row reductions):
    # ~8 slabs of S rows + ~40 weight/reduction rows of wx, per direction.
    flops_vpu = (8 * S + 40 * wx) * n_particles * 2

    bytes_particle = (16 + 16 + 8 + 8 + 8 + 2 * 24 + 32) * n_particles * 4
    bytes_particle = int(bytes_particle * 1.8)        # + backward cotangents
    grid_block = 8 * wz * wx * 4                      # one (8*wz, wx) f32 ref
    refs_rw = (4 + 3 + 3) * 2 * 2 + 3 * 2 + (3 + 3)   # p2g rw, splat rw, reads
    bytes_grid = refs_rw * grid_block * n_tiles * 2   # fwd + bwd
    bytes_total = bytes_particle + bytes_grid

    achieved_tflops = flops_mxu * rate_fwd_bwd / 1e12
    achieved_gbps = bytes_total * rate_fwd_bwd / 1e9
    return {
        "flops_mxu_per_substep": flops_mxu,
        "flops_vpu_per_substep": int(flops_vpu),
        "hbm_bytes_per_substep": int(bytes_total),
        "achieved_mxu_tflops": round(achieved_tflops, 1),
        "achieved_hbm_gbps": round(achieved_gbps, 1),
        "mfu": round(achieved_tflops / PEAK_BF16_TFLOPS, 3),
        "hbm_util": round(achieved_gbps / PEAK_HBM_GBPS, 3),
        # bound attribution is MEASURED, not inferred from the two ratios
        # above: cutting the backward dots from 3 bf16 MXU passes to 1
        # (i.e. removing 2/3 of all backward MXU work) moved end-to-end
        # throughput only 1.016x, and halving wx's lane tiles saved 3.3%
        # (BASELINE round-4 narrative) — the kernels sit on VPU slab/weight
        # work and per-tile fixed costs, with MXU at ~21% and HBM at ~3%
        # of peak both far from binding.
        "bound": "vpu + per-tile overhead (measured; MXU/HBM ratios above "
                 "are utilization, not the binding resource)",
        "mxu_hbm_ratio_note": "analytic dense-equivalent accounting of the "
                              "chunked kernels' executed ops",
    }


def main():
    import jax

    # If the accelerator tunnel is down, the first backend touch can hang
    # indefinitely in the PJRT client (CLAUDE.md outage notes) — a signal
    # handler would never run because the main thread never returns to the
    # interpreter. Probe in a subprocess with a hard timeout and fail fast
    # with a structured record instead of eating the whole bench window.
    import subprocess
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=300, capture_output=True)
        probe_ok = probe.returncode == 0
    except subprocess.TimeoutExpired:
        probe_ok = False
    if not probe_ok:
        print(json.dumps({
            "metric": "fwd+bwd substeps/sec @ 1e5 particles (demo_pour flagship scene: mixed contact + rigid, 64^3 grid)",
            "value": 0.0, "unit": "substeps/s", "vs_baseline": 0.0,
            "error": "accelerator backend unreachable (tunnel down?)"}))
        sys.exit(1)

    env = build_headline_env()
    rate, rate_median = _measure_env(env)
    window = tuple(env.mpm_cfg.active_window)
    tile_c = int(env.mpm_cfg.chunk_tile)
    del env

    try:
        pv_env = build_pour_vel_env()
        pv_best, pv_median = _measure_env(pv_env)
        pour_vel_rate = round(pv_best, 2)
        pour_vel_median = round(pv_median, 2)
        del pv_env
    except Exception as e:  # never let the secondary metric sink the headline
        pour_vel_rate = f"error: {type(e).__name__}: {e}"[:200]
        pour_vel_median = None

    # cloth-family headline (VERDICT r4 #1): taco physics at native 1e4
    # particles — sticky cloth contact + penetration tracing + PD cloth
    try:
        cl_env = build_taco_bench_env()
        cl_best, cl_median = _measure_cloth_env(cl_env)
        cloth_rate = round(cl_best, 2)
        cloth_median = round(cl_median, 2)
        cloth_n = cl_env.n_particles
        cloth_tile = int(cl_env.mpm_cfg.chunk_tile)
        del cl_env
    except Exception as e:
        cloth_rate = f"error: {type(e).__name__}: {e}"[:200]
        cloth_median = None
        cloth_n = cloth_tile = None

    oracle_ok, oracle_info = tpu_oracle_check()
    try:
        cloth_ok, cloth_info = cloth_oracle_check()
        oracle_ok = oracle_ok and cloth_ok
        oracle_info.update(cloth_info)
    except Exception as e:
        oracle_ok = False
        oracle_info["cloth_gate_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        batched = batched_bench()
    except Exception as e:
        batched = {"error": f"{type(e).__name__}: {e}"[:200]}
    print(json.dumps({
        "metric": "fwd+bwd substeps/sec @ 1e5 particles (demo_pour flagship scene: mixed contact + rigid, 64^3 grid)",
        "value": round(rate, 2),
        "unit": "substeps/s",
        # best-of-8 (the program's speed in a fast tunnel phase) AND the
        # steadier median-of-8: identical programs spread 93-113/s run to
        # run through the tunnel (BASELINE.md) — report both
        "value_median": round(rate_median, 2),
        "vs_baseline": round(rate / ASSUMED_TAICHI_CPU_BASELINE, 2),
        "vs_baseline_median": round(rate_median / ASSUMED_TAICHI_CPU_BASELINE, 2),
        # vs_baseline divides by an ESTIMATED 10 substeps/s Taichi-CPU rate
        # (Taichi is uninstallable here; BASELINE.md documents the estimate)
        "baseline_estimated": True,
        "vs_measured_torch_cpu": round(rate / MEASURED_TORCH_CPU_FWDBWD, 1),
        "pour_vel_secondary": pour_vel_rate,
        "pour_vel_secondary_median": pour_vel_median,
        # cloth family (demo_taco physics, native 1e4 particles, sticky
        # cloth contact + PD solve): fwd+bwd substeps/s
        "cloth_taco_substeps_per_s": cloth_rate,
        "cloth_taco_substeps_per_s_median": cloth_median,
        "cloth_taco_n_particles": cloth_n,
        "cloth_taco_tile_c": cloth_tile,
        "tpu_oracle_ok": oracle_ok,
        "tpu_oracle_err": oracle_info,
        "batched": batched,
        "active_window": list(window),
        "tile_c": tile_c,
        "roofline": roofline(100_000, window, rate, tile_c),
    }))


if __name__ == "__main__":
    main()
