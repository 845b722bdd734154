"""Time the headline bench rollout (1e5-particle pour_vel, 50 steps) under
the two remat policies: "step" (per-env-step jax.checkpoint, O(1)-in-T
memory, backward replays each forward) vs "none" (scan stores the
custom_vjp residuals, reference-style store-all tape — no replay).
Run on TPU. The scene comes from bench.build_headline_env so this measures
exactly the BASELINE.md metric's program."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax


def main():
    import bench

    env = bench.build_headline_env()
    steps = 50
    actions = np.zeros((steps, env.action_dim))
    results = {}
    which = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        ["step", "none"]
    for remat in which:
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
    if {"step", "none"} <= set(results):
        print(f"speedup none/step: "
              f"{results['none'][0] / results['step'][0]:.3f}x")


if __name__ == "__main__":
    main()
