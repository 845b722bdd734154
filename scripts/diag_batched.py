"""Explain the batched-rollout per-env throughput (VERDICT r3 #6).

Round 2 recorded B=8 x 5000-particle pour_vel at ~150 substeps/s per env
while a round-1-era measurement had a single 5000-particle env at ~348 —
suggesting a 2.3x per-env slowdown under vmap. But those numbers came from
DIFFERENT engines (the 348 was the round-1 dense-XLA f32 engine, before
bf16x3 kernels/sorted carry) and different processes (tunnel phases).

This measures, IN ONE PROCESS on today's engine with identical configs:
  B=1 batched (vmap overhead included),
  B=8 batched,
  B=1 unbatched (plain rollout_and_grad — no vmap at all),
and prints per-env and aggregate substeps/s.

Run on TPU: python scripts/diag_batched.py [--steps 50]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def build_env():
    from softmac_tpu import SoftMacEnv, load
    cfg = load(str(ROOT / "softmac_tpu/config/demo_pour_vel_config.py"))
    cfg.defrost(); cfg.TPU.active_window = (48, 32, 16); cfg.freeze()
    env = SoftMacEnv(cfg)
    env.reset()
    return env


def timed(fn, warm_out, repeats=5):
    import jax
    jax.block_until_ready(warm_out)
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        jax.block_until_ready(fn())
        ts.append(time.time() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()
    steps = args.steps

    import jax  # noqa: F401

    env = build_env()
    rng = np.random.RandomState(1)
    work1 = steps * env.substeps

    # remat="none" everywhere: the store-all tape is the cheap-to-compile,
    # fastest program at this 50-step horizon (scripts/diag_remat.py) and
    # keeps the three variants directly comparable
    a1 = np.zeros((steps, env.action_dim))
    fn_un = lambda: env.rollout_and_grad(a1, loss_start_frame=0,
                                         loss_stride=steps,
                                         remat="none")["loss"]
    t_un = timed(fn_un, fn_un())
    print(f"B=1 unbatched : {work1 / t_un:8.1f} substeps/s per env",
          flush=True)

    for B in (1, 8):
        acts = rng.randn(B, steps, env.action_dim) * 1e-3
        fn = lambda: env.batched_rollout_and_grad(
            acts, loss_start_frame=0, loss_stride=steps,
            remat="none")["loss"]
        t = timed(fn, fn())
        agg = B * work1 / t
        print(f"B={B} batched   : {agg / B:8.1f} substeps/s per env, "
              f"{agg:8.1f} aggregate", flush=True)


if __name__ == "__main__":
    main()
