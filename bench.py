"""Benchmark: forward+backward simulation substeps/sec at 1e5 particles
(the BASELINE.json north-star metric) on the pour scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

vs_baseline uses the documented Taichi-CPU estimate of 10 fwd+bwd
substeps/s at 1e5 particles (BASELINE.md) — the reference publishes no
numbers and Taichi cannot run here. A REAL measured comparison point is
included as vs_measured_torch_cpu: scripts/baseline_torch.py measured the
same pour hot loop in vectorized torch-CPU f64 autograd on this host at
0.367 fwd / 0.010 fwd+bwd substeps/s (single-core host; see BASELINE.md).

Also reports tpu_oracle_ok: one jitted substep executed on the attached
accelerator cross-checked against the NumPy f64 oracle at f32 tolerance
(the only non-CPU correctness execution in the repo — the pytest suite
forces CPU).
"""
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

ASSUMED_TAICHI_CPU_BASELINE = 10.0   # fwd+bwd substeps/s at 1e5 (estimate)
MEASURED_TORCH_CPU_FWDBWD = 0.010    # scripts/baseline_torch.py on this host
MEASURED_TORCH_CPU_FWD = 0.367


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
    sys.path.insert(0, str(Path(__file__).resolve().parent / "tests"))
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
    # window engages them; full-grid above runs the dense XLA path) — the
    # only on-hardware correctness check the kernels get
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
    return ok, {"err_x": err_x, "err_v": err_v,
                "err_x_fused": err_x_w, "err_v_fused": err_v_w,
                "err_x_chunked": err_x_c, "err_v_chunked": err_v_c}


def batched_bench():
    """Batched multi-trajectory throughput (SURVEY 2.4 'batched rollouts
    map to vmap + DP'): B=8 independent pour_vel trajectories (5000
    particles each, the flagship scene) rolled out fwd+bwd in ONE jitted
    vmap program. Returns aggregate substeps/s across the batch."""
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
    return {"B": B, "n_particles": env.n_particles,
            "substeps_per_s": round(rate, 1)}


def build_headline_env():
    """The headline-metric scene: the pour_vel config scaled to 1e5
    particles (tile the packed init state with small jitter, fed through
    the constructor's init_particles path — same grid, physics, contact),
    active window (40, 32, 16). Shared with scripts/diag_remat.py and
    scripts/profile_* so every measurement runs the SAME scene."""
    from softmac_tpu import SoftMacEnv, load

    root = Path(__file__).resolve().parent
    cfg = load(str(root / "softmac_tpu/config/demo_pour_vel_config.py"))
    cfg.defrost(); cfg.TPU.active_window = (40, 32, 16); cfg.freeze()
    base_state = np.load(root / "envs/pour/pour_mpm_init_state_corotated.npy")
    reps = int(np.ceil(1e5 / base_state.shape[0]))
    rng = np.random.RandomState(0)
    tiled = np.tile(base_state[:, :3], (reps, 1))[:100_000]
    tiled += rng.randn(100_000, 3) * 1e-4
    tiled += np.array([0.0, 0.04, 0.0])
    env = SoftMacEnv(cfg, init_particles=tiled)
    env.reset()
    return env


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
            "metric": "fwd+bwd substeps/sec @ 1e5 particles (pour scene, 64^3 grid)",
            "value": 0.0, "unit": "substeps/s", "vs_baseline": 0.0,
            "error": "accelerator backend unreachable (tunnel down?)"}))
        sys.exit(1)

    env = build_headline_env()

    steps = 50
    actions = np.zeros((steps, env.action_dim))
    substeps = env.substeps

    # remat="none" (store-all residual tape, no backward replay) measured
    # 1.24x over the per-step-checkpoint default at this 50-step horizon
    # (scripts/diag_remat.py on TPU: 110.1 vs 89.0 substeps/s, identical
    # loss/grad). The per-step policy remains the demo default for 3000-step
    # horizons where the tape would not fit.
    out = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=50,
                               remat="none")
    jax.block_until_ready(out["loss"])  # compile + warmup

    times = []
    for _ in range(3):
        t0 = time.time()
        out = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=50,
                                   remat="none")
        jax.block_until_ready(out["loss"])
        times.append(time.time() - t0)
    elapsed = min(times)
    rate = steps * substeps / elapsed

    assert np.isfinite(float(out["loss"])), "benchmark rollout diverged"
    assert not bool(out["terms"].get("window_overflow", False)), \
        "active window overflowed"

    oracle_ok, oracle_info = tpu_oracle_check()
    try:
        batched = batched_bench()
    except Exception as e:  # never let the extra metric sink the headline
        batched = {"error": f"{type(e).__name__}: {e}"[:200]}
    print(json.dumps({
        "metric": "fwd+bwd substeps/sec @ 1e5 particles (pour scene, 64^3 grid)",
        "value": round(rate, 2),
        "unit": "substeps/s",
        "vs_baseline": round(rate / ASSUMED_TAICHI_CPU_BASELINE, 2),
        "vs_measured_torch_cpu": round(rate / MEASURED_TORCH_CPU_FWDBWD, 1),
        "tpu_oracle_ok": oracle_ok,
        "tpu_oracle_err": oracle_info,
        "batched": batched,
    }))


if __name__ == "__main__":
    main()
