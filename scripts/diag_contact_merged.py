"""A/B the merged single-launch mixed-contact kernels against the legacy
split two-launch family, end-to-end on the 1e5-particle flagship scene
(VERDICT r4 #3: attack the contact pipeline — the round-5 bisect put the
contact BACKWARD at 3.44 ms/substep and forward at 2.30 of an 8.49 ms
fwd+bwd substep).

Both styles run the identical _mixed1_math/_mixed2_math composition; the
merged family does it in ONE pallas_call each way, eliminating the (8, N)
st1/gst1 HBM round-trips and one launch per prim per substep in each
direction. Gradient parity is asserted on-hardware (cosine + relative L2
of the full action gradient).

Run on TPU (TPU otherwise idle): python scripts/diag_contact_merged.py
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
    for name, flags in (("split", {"SOFTMAC_TPU_CONTACT_SPLIT": "1"}),
                        ("merged", {})):
        os.environ.pop("SOFTMAC_TPU_CONTACT_SPLIT", None)
        os.environ.update(flags)
        best, med, loss, g = measure()
        results[name] = (best, med, loss, g)
        print(f"{name:7s}: best {best:7.2f} median {med:7.2f} substeps/s "
              f"loss {loss:.4f}", flush=True)
    os.environ.pop("SOFTMAC_TPU_CONTACT_SPLIT", None)

    (b_s, m_s, l_s, g_s), (b_m, m_m, l_m, g_m) = (
        results["split"], results["merged"])
    cos = float(g_s @ g_m / (np.linalg.norm(g_s) * np.linalg.norm(g_m)))
    rel = float(np.linalg.norm(g_s - g_m) / np.linalg.norm(g_s))
    print(f"\nmerged/split speedup: best {b_m / b_s:.3f}x "
          f"median {m_m / m_s:.3f}x")
    print(f"loss split {l_s:.6f} merged {l_m:.6f} "
          f"(rel {abs(l_s - l_m) / abs(l_s):.2e})")
    print(f"action-grad parity: cos {cos:.9f} relL2 {rel:.2e}")
    assert abs(l_s - l_m) / abs(l_s) < 1e-4
    assert cos > 0.9999, cos


if __name__ == "__main__":
    main()
