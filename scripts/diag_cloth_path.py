"""In-process A/B of the cloth-family kernel paths on the taco headline
scene (VERDICT r4 #1: "the chunked-vs-fused delta is measured in-process").

Variants (one process — tunnel-variance rule, BASELINE.md):
  chunked : production default (sorted carry + y-chunked kernels)
  fused   : SOFTMAC_TPU_NO_CHUNKED=1 (sorted carry + fully-fused kernels)
  dense   : SOFTMAC_TPU_NO_FUSED_KERNEL=1 (no sorting, dense XLA matmuls)

The env flags are read at TRACE time, so each variant builds a FRESH env
(own jit cache) after setting the flag. Loss equality across variants is
asserted to ~1e-3 relative (same physics, different reduction orders).

Run on TPU: python scripts/diag_cloth_path.py [--steps 30 --repeats 6]
"""
import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import bench  # noqa: E402


def measure(steps, repeats):
    import jax
    env = bench.build_taco_bench_env()
    sort_on = env.use_sorted_carry()
    actions = np.zeros((steps, env.action_dim))
    out = env.rollout_and_grad(actions, loss_start_frame=0,
                               loss_stride=steps * env.substeps,
                               remat="none")
    jax.block_until_ready(out["loss"])
    times = []
    for _ in range(repeats):
        t0 = time.time()
        out = env.rollout_and_grad(actions, loss_start_frame=0,
                                   loss_stride=steps * env.substeps,
                                   remat="none")
        jax.block_until_ready(out["loss"])
        times.append(time.time() - t0)
    work = steps * env.substeps
    assert not bool(out["terms"].get("window_overflow", False))
    return (work / min(times), work / np.median(times), float(out["loss"]),
            sort_on, int(env.mpm_cfg.chunk_tile))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=6)
    args = ap.parse_args()

    results = {}
    for name, flags in (
            ("chunked", {}),
            ("fused", {"SOFTMAC_TPU_NO_CHUNKED": "1"}),
            ("dense", {"SOFTMAC_TPU_NO_FUSED_KERNEL": "1"})):
        for k in ("SOFTMAC_TPU_NO_CHUNKED", "SOFTMAC_TPU_NO_FUSED_KERNEL"):
            os.environ.pop(k, None)
        os.environ.update(flags)
        best, med, loss, sort_on, tile = measure(args.steps, args.repeats)
        results[name] = (best, med, loss)
        print(f"{name:8s}: best {best:7.2f} median {med:7.2f} substeps/s "
              f"loss {loss:.6f} sorted_carry={sort_on} tile={tile}",
              flush=True)

    losses = [v[2] for v in results.values()]
    rel = (max(losses) - min(losses)) / max(abs(losses[0]), 1e-9)
    print(f"loss spread across variants: {rel:.2e} (gate < 1e-3)")
    assert rel < 1e-3, "variant losses disagree — kernel-path bug"
    ch, fu = results["chunked"][0], results["fused"][0]
    print(f"chunked vs fused: {ch / fu:.3f}x; vs dense: "
          f"{ch / results['dense'][0]:.3f}x")


if __name__ == "__main__":
    main()
