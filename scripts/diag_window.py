"""Active-window sweep on the flagship headline scene (demo_pour physics
at 1e5 particles): the chunked kernels' MXU work scales with wx (dot
columns R = 25*wx fwd / 50*wx bwd — bench.roofline), so a window sized to
what the 50-step measurement scene actually covers (the rollout's
window-overflow flag asserts coverage) is a direct throughput lever.

Usage: python scripts/diag_window.py [wx,wy,wz ...]   (default sweep)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax


def main():
    import bench
    from softmac_tpu import SoftMacEnv

    windows = [tuple(int(v) for v in a.split(","))
               for a in sys.argv[1:] if "," in a] or \
        [(48, 32, 16), (32, 32, 16), (24, 32, 16)]

    steps = 50
    for win in windows:
        cfg, tiled = bench._tile_to_1e5("demo_pour_config.py")
        cfg.defrost(); cfg.TPU.active_window = win; cfg.freeze()
        env = SoftMacEnv(cfg, init_particles=tiled)
        env.reset()
        actions = np.zeros((steps, env.action_dim))
        try:
            out = env.rollout_and_grad(actions, loss_start_frame=0,
                                       loss_stride=steps, remat="none")
            jax.block_until_ready(out["loss"])
            times = []
            for _ in range(3):
                t0 = time.time()
                out = env.rollout_and_grad(actions, loss_start_frame=0,
                                           loss_stride=steps, remat="none")
                jax.block_until_ready(out["loss"])
                times.append(time.time() - t0)
            rate = steps * env.substeps / min(times)
            ovf = bool(out["terms"].get("window_overflow", False))
            g = np.asarray(out["action_grad"])
            print(f"window={win}: {rate:7.2f} substeps/s  overflow={ovf}  "
                  f"loss={float(out['loss']):.4f}  max|g|={np.abs(g).max():.3e}",
                  flush=True)
        except Exception as e:
            print(f"window={win}: FAILED {type(e).__name__}: {e}", flush=True)
        del env


if __name__ == "__main__":
    main()
