"""Bisect the CONTACT share of the flagship substep, fwd+bwd, in ONE
process (VERDICT r4 #3/#6: attack or close the contact pipeline with
numbers).

Variants on the 1e5-particle flagship scene (bench.build_headline_env):
  full        : production program
  bwd-zero    : SOFTMAC_TPU_CONTACT_BWD=zero — the contact custom-vjp
                returns zeros without running k2b/k1b or the tail vjp
                (gradients WRONG; isolates the contact backward cost)
  nocontact   : primitives_contact all False (drops the per-prim collide
                passes AND their backward; keeps the mixed gather/splat
                transfer stages)

Deltas: full - bwd-zero = contact backward cost; bwd-zero - nocontact =
contact forward cost (gathers + kernels + tail); the round-3 bisect
already split the forward (gather 0.45 ms/prim, kernels ~0.1 ms).

Run on TPU (TPU must be otherwise idle): python scripts/diag_contact_bwd.py
"""
import os
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import bench  # noqa: E402


def measure(steps=100, repeats=6, nocontact=False):
    import jax
    env = bench.build_headline_env()
    if nocontact:
        env.set_primitives_contact([False] * env.n_primitives)
    actions = np.zeros((steps, env.action_dim))
    out = env.rollout_and_grad(actions, loss_start_frame=0,
                               loss_stride=steps, remat="none")
    jax.block_until_ready(out["loss"])
    times = []
    for _ in range(repeats):
        t0 = time.time()
        out = env.rollout_and_grad(actions, loss_start_frame=0,
                                   loss_stride=steps, remat="none")
        jax.block_until_ready(out["loss"])
        times.append(time.time() - t0)
    work = steps * env.substeps
    return work / min(times), work / np.median(times), float(out["loss"])


def main():
    results = {}
    for name, flags, kw in (
            ("full", {}, {}),
            ("bwd-zero", {"SOFTMAC_TPU_CONTACT_BWD": "zero"}, {}),
            ("nocontact", {}, {"nocontact": True})):
        os.environ.pop("SOFTMAC_TPU_CONTACT_BWD", None)
        os.environ.update(flags)
        best, med, loss = measure(**kw)
        results[name] = (best, med, loss)
        print(f"{name:10s}: best {best:7.2f} median {med:7.2f} substeps/s "
              f"loss {loss:.4f}", flush=True)
    os.environ.pop("SOFTMAC_TPU_CONTACT_BWD", None)

    full, bz, nc = (results[k][0] for k in ("full", "bwd-zero", "nocontact"))
    ms = lambda r: 1e3 / r
    print(f"\nper-substep fwd+bwd: full {ms(full):.3f} ms, "
          f"bwd-zero {ms(bz):.3f} ms, nocontact {ms(nc):.3f} ms")
    print(f"contact BACKWARD cost: {ms(full) - ms(bz):.3f} ms/substep")
    print(f"contact FORWARD  cost: {ms(bz) - ms(nc):.3f} ms/substep "
          f"(round-3 split: ~0.45 ms/prim gather + ~0.1 ms kernels)")
    # loss must be identical between full and bwd-zero (fwd untouched)
    assert abs(results["full"][2] - results["bwd-zero"][2]) < 1e-3 * (
        abs(results["full"][2]) + 1e-9)


if __name__ == "__main__":
    main()
