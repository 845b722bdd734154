"""Validate the sorted-carry design: sort the particle state + params ONCE
(outside the differentiated rollout), run the whole 50-step bench rollout on
the sorted order with NO per-step permutes, and check (a) throughput,
(b) that drift keeps every chunked tile inside its 16-row window (overflow
flag stays False).

Variants: fused (sorted carry, fused kernels) / chunked (sorted carry,
chunked kernels).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "chunked"


def main():
    import jax
    import jax.numpy as jnp
    from softmac_tpu import SoftMacEnv, load
    from softmac_tpu.engine import mpm
    from softmac_tpu.ops import pallas_chunked

    # no in-step sort; chunked validity comes from the pre-sorted carry
    mpm.sorted_transfers_wanted = lambda cfg, dtype: False
    if VARIANT == "chunked":
        mpm._chunked_transfer_wanted = \
            lambda cfg, dtype: pallas_chunked.kernel_wanted(cfg.active_window)
    else:
        mpm._chunked_transfer_wanted = lambda cfg, dtype: False

    root = Path(__file__).resolve().parents[1]
    cfg = load(str(root / "softmac_tpu/config/demo_pour_vel_config.py"))
    cfg.defrost(); cfg.TPU.active_window = (40, 32, 16); cfg.freeze()
    base_state = np.load(root / "envs/pour/pour_mpm_init_state_corotated.npy")
    reps = int(np.ceil(1e5 / base_state.shape[0]))
    rng = np.random.RandomState(0)
    tiled = np.tile(base_state[:, :3], (reps, 1))[:100_000]
    tiled += rng.randn(100_000, 3) * 1e-4
    tiled += np.array([0.0, 0.04, 0.0])

    # pre-sort by base y-cell (host-side, once)
    key = np.floor(tiled[:, 1] * 64.0 - 0.5).astype(np.int64)
    order = np.argsort(key, kind="stable")
    env = SoftMacEnv(cfg, init_particles=tiled[order])
    env.reset()

    steps = 50
    actions = np.zeros((steps, env.action_dim))
    out = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=50)
    jax.block_until_ready(out["loss"])
    ts = []
    for _ in range(2):
        t0 = time.time()
        out = env.rollout_and_grad(actions, loss_start_frame=0,
                                   loss_stride=50)
        jax.block_until_ready(out["loss"])
        ts.append(time.time() - t0)
    rate = steps * env.substeps / min(ts)
    ovf = bool(out["terms"].get("window_overflow", False))
    print(f"sorted_carry/{VARIANT:8s} {rate:6.2f} substeps/s "
          f"({1e3 * min(ts) / steps:6.2f} ms/env-step) overflow={ovf} "
          f"loss={float(out['loss']):.4f}")


if __name__ == "__main__":
    main()
