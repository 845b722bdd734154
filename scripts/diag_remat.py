"""Time a fwd+bwd rollout under the remat policies: "step" (per-env-step
jax.checkpoint, O(1)-in-T memory, backward replays each forward), "none"
(scan stores the custom_vjp residuals, reference-style store-all tape — no
replay), and "window:K" (checkpoint every K steps, store-all inside).
Run on TPU. Default scene comes from bench.build_headline_env (the
BASELINE.md metric's exact program); --scene demo --steps 3000 measures
the demo_pour epoch horizon instead."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax


def main():
    import argparse

    import bench

    ap = argparse.ArgumentParser()
    ap.add_argument("policies", nargs="*",
                    help="remat policies to time (step, none, window:K); "
                         "default: step none")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--scene", choices=["headline", "demo"],
                    default="headline",
                    help="headline: 1e5-particle flagship bench scene; "
                         "demo: the demo_pour scene at its own 5000 "
                         "particles (for demo-horizon A/Bs, e.g. "
                         "--steps 3000 step window:50)")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    if args.scene == "headline":
        env = bench.build_headline_env()
    else:
        from softmac_tpu import SoftMacEnv, load
        root = Path(__file__).resolve().parents[1]
        cfg = load(str(root / "softmac_tpu/config/demo_pour_config.py"))
        env = SoftMacEnv(cfg)
        env.reset()
    steps = args.steps
    actions = np.zeros((steps, env.action_dim))
    results = {}
    which = args.policies or ["step", "none"]
    # demo scene: mirror demo_pour's exact loss sampling so the "step"
    # program is the demo's own cached executable
    if args.scene == "demo":
        start = (2 * steps * env.substeps // 3) // 20 * 20
        stride = 20
    else:
        start, stride = 0, steps
    for remat in which:
        out = env.rollout_and_grad(actions, loss_start_frame=start,
                                   loss_stride=stride, remat=remat)
        jax.block_until_ready(out["loss"])
        times = []
        for _ in range(args.repeats):
            t0 = time.time()
            out = env.rollout_and_grad(actions, loss_start_frame=start,
                                       loss_stride=stride, remat=remat)
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
