"""Benchmark: forward+backward simulation substeps/sec at 1e5 particles
(the BASELINE.json north-star metric) on the pour scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers and Taichi is not installed
here; BASELINE.md adopts an estimated Taichi-CPU fwd+bwd rate of 10
substeps/s at 1e5 particles on the demo_pour workload (64^3 grid, f64,
mixed contact) as the comparison point, so vs_baseline = value / 10.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

ASSUMED_TAICHI_CPU_BASELINE = 10.0  # fwd+bwd substeps/s at 1e5 particles


def main():
    import jax
    from softmac_tpu import SoftMacEnv, load

    root = Path(__file__).resolve().parent
    cfg = load(str(root / "softmac_tpu/config/demo_pour_vel_config.py"))
    # active-window grid (exact; overflow-checked below) sized for the pour scene
    cfg.defrost(); cfg.TPU.active_window = (40, 32, 16); cfg.freeze()

    # scale the pour scene to 1e5 particles (tile the packed init state with
    # small jitter; same grid, physics, and contact setup)
    env = SoftMacEnv(cfg)
    base_state = np.load(root / "envs/pour/pour_mpm_init_state_corotated.npy")
    reps = int(np.ceil(1e5 / base_state.shape[0]))
    rng = np.random.RandomState(0)
    tiled = np.tile(base_state, (reps, 1))[:100_000]
    tiled[:, :3] += rng.randn(100_000, 3) * 1e-4
    tiled[:, :3] += np.array([0.0, 0.04, 0.0])

    cfg = cfg.clone().defrost()
    cfg.SHAPES = []
    env2 = object.__new__(SoftMacEnv)  # rebuild via normal init but larger N
    # simplest robust path: construct env normally, then swap the particle set
    env.init_particles = tiled
    env.n_particles = tiled.shape[0]
    import dataclasses
    import jax.numpy as jnp
    env.mpm_cfg = dataclasses.replace(env.mpm_cfg, n_particles=tiled.shape[0])
    n = tiled.shape[0]
    env.mpm_params = env.mpm_params.replace(
        mu=jnp.broadcast_to(env.mpm_params.mu[:1], (n,)),
        lam=jnp.broadcast_to(env.mpm_params.lam[:1], (n,)),
        yield_stress=jnp.broadcast_to(env.mpm_params.yield_stress[:1], (n,)),
        control_idx=jnp.full((n,), -1, jnp.int32),
    )
    env._jit_cache.clear()
    env.reset()

    steps = 50
    actions = np.zeros((steps, env.action_dim))
    substeps = env.substeps

    out = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=50)
    jax.block_until_ready(out["loss"])  # compile + warmup

    times = []
    for _ in range(3):
        t0 = time.time()
        out = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=50)
        jax.block_until_ready(out["loss"])
        times.append(time.time() - t0)
    elapsed = min(times)
    rate = steps * substeps / elapsed

    assert np.isfinite(float(out["loss"])), "benchmark rollout diverged"
    assert not bool(out["terms"].get("window_overflow", False)), "active window overflowed"
    print(json.dumps({
        "metric": "fwd+bwd substeps/sec @ 1e5 particles (pour scene, 64^3 grid)",
        "value": round(rate, 2),
        "unit": "substeps/s",
        "vs_baseline": round(rate / ASSUMED_TAICHI_CPU_BASELINE, 2),
    }))


if __name__ == "__main__":
    main()
