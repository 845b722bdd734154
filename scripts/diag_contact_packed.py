"""A/B the sublane-PACKED contact kernels (S=8: every logical channel
fills native (8, T/8) f32 vreg tiles) against the unpacked (1, T)-row
merged family, end-to-end on the 1e5-particle flagship scene.

Motivation (BASELINE round-5): the contact BACKWARD is 3.44 ms of the
8.49 ms fwd+bwd substep and the merged-launch A/B moved only 1.016x, so
the cost is in-kernel VPU math — which at (1, T) row granularity uses
one sublane of each 8-sublane vreg. Packing multiplies elementwise VPU
density by up to 8x at the cost of XLA-side reshapes per operand.

Run on TPU (TPU otherwise idle): python scripts/diag_contact_packed.py
"""
import os
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import bench  # noqa: E402


def measure(steps=100, repeats=6):
    import jax
    env = bench.build_headline_env()
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
    g = np.asarray(out["action_grad"], np.float64).ravel()
    return work / min(times), work / np.median(times), float(out["loss"]), g


def main():
    results = {}
    for name, flags in (("rows", {"SOFTMAC_TPU_CONTACT_PACKED": "0"}),
                        ("packed", {"SOFTMAC_TPU_CONTACT_PACKED": "1"})):
        os.environ.update(flags)
        best, med, loss, g = measure()
        results[name] = (best, med, loss, g)
        print(f"{name:7s}: best {best:7.2f} median {med:7.2f} substeps/s "
              f"loss {loss:.4f}", flush=True)
    os.environ.pop("SOFTMAC_TPU_CONTACT_PACKED", None)

    (b_r, m_r, l_r, g_r), (b_p, m_p, l_p, g_p) = (
        results["rows"], results["packed"])
    cos = float(g_r @ g_p / (np.linalg.norm(g_r) * np.linalg.norm(g_p)))
    rel = float(np.linalg.norm(g_r - g_p) / np.linalg.norm(g_r))
    print(f"\npacked/rows speedup: best {b_p / b_r:.3f}x "
          f"median {m_p / m_r:.3f}x")
    print(f"loss rows {l_r:.6f} packed {l_p:.6f} "
          f"(rel {abs(l_r - l_p) / abs(l_r):.2e})")
    print(f"action-grad parity: cos {cos:.9f} relL2 {rel:.2e}")
    assert abs(l_r - l_p) / abs(l_r) < 1e-4
    assert cos > 0.9999, cos


if __name__ == "__main__":
    main()
