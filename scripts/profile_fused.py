"""Phase profile: fwd-only and fwd+bwd substep rates at 1e5 particles on the
bench pour scene, with the fused transfer kernels on (default) or off
(SOFTMAC_TPU_NO_FUSED_KERNEL=1). Run twice to compare:

    python scripts/profile_fused.py
    SOFTMAC_TPU_NO_FUSED_KERNEL=1 python scripts/profile_fused.py
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
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
    substeps = env.substeps
    tag = "off" if os.environ.get("SOFTMAC_TPU_NO_FUSED_KERNEL") else "on"

    def bench(fn, label):
        out = fn()
        jax.block_until_ready(out["loss"])
        times = []
        for _ in range(3):
            t0 = time.time()
            out = fn()
            jax.block_until_ready(out["loss"])
            times.append(time.time() - t0)
        el = min(times)
        print(f"fused={tag} {label}: {steps * substeps / el:.2f} substeps/s "
              f"({1e3 * el / (steps * substeps):.3f} ms/substep)")

    bench(lambda: env.rollout(actions, loss_start_frame=0, loss_stride=50),
          "fwd     ")
    bench(lambda: env.rollout_and_grad(actions, loss_start_frame=0,
                                       loss_stride=50), "fwd+bwd ")


if __name__ == "__main__":
    main()
