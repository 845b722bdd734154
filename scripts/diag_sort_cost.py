"""Bisect the end-to-end cost of the env-step spatial sort in the bench
rollout (bench.py measured: no-sort 52.9/s vs sort 15.2/s with identical
kernels — the machinery in isolation microbenches at ~2 ms/env-step, so
something about the interaction is expensive). Variants monkeypatch
engine.mpm's sort helpers inside the pour_vel bench workload.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "baseline"


def main():
    import jax
    import jax.numpy as jnp
    from softmac_tpu import SoftMacEnv, load
    from softmac_tpu.engine import mpm

    if VARIANT == "no_sort":
        mpm.sorted_transfers_wanted = lambda cfg, dtype: False
    elif VARIANT == "identity_perm":
        def sort_perm(cfg, x_vec):
            n = x_vec[0].shape[0]
            p = jnp.arange(n, dtype=jnp.int32)
            return p, p
        mpm.sort_perm = sort_perm
    elif VARIANT == "no_params_permute":
        mpm.permute_params = lambda params, perm: params
    elif VARIANT == "no_state_permute":
        mpm.permute_state = lambda state, perm: state
    elif VARIANT == "baseline":
        pass
    else:
        raise SystemExit(f"unknown variant {VARIANT}")
    # chunked needs truly sorted data; force the fused family so every
    # variant runs the same kernels and only the sort machinery differs
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
    env = SoftMacEnv(cfg, init_particles=tiled)
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
    print(f"{VARIANT:18s} {rate:6.2f} substeps/s "
          f"({1e3 * min(ts) / steps:6.2f} ms/env-step)")


if __name__ == "__main__":
    main()
