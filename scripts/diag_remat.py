"""Time the bench rollout (1e5-particle pour_vel, 50 steps) under the two
remat policies: "step" (per-env-step jax.checkpoint, O(1)-in-T memory,
backward replays each forward) vs "none" (scan stores the custom_vjp
residuals, reference-style store-all tape — no replay). Run on TPU."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax


def main():
    from softmac_tpu import SoftMacEnv, load
    root = Path(__file__).resolve().parents[1]
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

    steps = 50
    actions = np.zeros((steps, env.action_dim))
    results = {}
    for remat in (sys.argv[1:] or ["step", "none"]):
        out = env.rollout_and_grad(actions, loss_start_frame=0,
                                   loss_stride=50, remat=remat)
        jax.block_until_ready(out["loss"])
        times = []
        for _ in range(3):
            t0 = time.time()
            out = env.rollout_and_grad(actions, loss_start_frame=0,
                                       loss_stride=50, remat=remat)
            jax.block_until_ready(out["loss"])
            times.append(time.time() - t0)
        el = min(times)
        rate = steps * env.substeps / el
        g = np.asarray(out["action_grad"])
        results[remat] = (rate, float(out["loss"]), float(np.abs(g).max()))
        print(f"remat={remat:5s}: {rate:7.1f} substeps/s  "
              f"loss={float(out['loss']):.6f}  max|g|={np.abs(g).max():.3e}")
    if len(results) == 2:
        print(f"speedup none/step: "
              f"{results['none'][0] / results['step'][0]:.3f}x")


if __name__ == "__main__":
    main()
