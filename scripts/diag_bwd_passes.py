"""A/B the backward-kernel dot precision (SOFTMAC_TPU_BWD_DOT_PASSES).

The transfer kernels' backward is ~2/3 of their MXU work and runs bf16x3
(3 MXU passes per dot). This measures the flagship headline with the
backward dots at 3 (baseline), 2 (full-a x bf16-b), and 1 (plain bf16)
passes IN ONE PROCESS (tunnel variance rule), and reports gradient
agreement against the 3-pass baseline.

Run on TPU: python scripts/diag_bwd_passes.py [--steps 50] [--repeats 5]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import bench  # noqa: E402  (sets SOFTMAC_TPU_TILE_C before package import)
from softmac_tpu.ops import pallas_fused as _pf  # noqa: E402


def measure(passes, steps, repeats):
    import jax

    _pf._BWD_PASSES = passes
    env = bench.build_headline_env()
    actions = np.zeros((steps, env.action_dim))
    out = env.rollout_and_grad(actions, loss_start_frame=0,
                               loss_stride=steps, remat="none")
    jax.block_until_ready(out["loss"])            # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.time()
        out = env.rollout_and_grad(actions, loss_start_frame=0,
                                   loss_stride=steps, remat="none")
        jax.block_until_ready(out["loss"])
        times.append(time.time() - t0)
    rate = steps * env.substeps / min(times)
    loss = float(out["loss"])
    grad = np.asarray(out["action_grad"], np.float64)
    del env
    return rate, loss, grad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    results = {}
    for passes in (3, 1, 2):
        try:
            rate, loss, grad = measure(passes, args.steps, args.repeats)
        except Exception as e:
            print(f"passes={passes}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}")
            continue
        results[passes] = (rate, loss, grad)
        print(f"passes={passes}: {rate:7.2f} substeps/s   loss={loss:.8e}")

    r3, l3, g3 = results[3]
    gn = np.linalg.norm(g3) + 1e-30
    for passes in (2, 1):
        if passes not in results:
            continue
        r, l, g = results[passes]
        rel = np.linalg.norm(g - g3) / gn
        cos = float((g * g3).sum() / (np.linalg.norm(g) * gn + 1e-30))
        print(f"passes={passes} vs 3: speedup x{r / r3:.3f}, "
              f"loss match {abs(l - l3) / (abs(l3) + 1e-30):.2e}, "
              f"grad rel-L2 {rel:.3e}, cos {cos:.6f}")


if __name__ == "__main__":
    main()
