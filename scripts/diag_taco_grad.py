"""Taco gradient diagnostic: does the cloth-attachment action gradient point
the right way at reference scale?

Checks the analytic gradient of the taco loss (chamfer of MPM particles to
the wrapped-taco target, frames 1800..2000) against central finite
differences on a few action coordinates, and reports the loss change along
+-g. Round-1 taco optimization DIVERGED (28638 -> 99213 over 25 epochs);
this isolates whether the gradient itself or the controller loop is at
fault. Run on TPU (2000-substep rollouts).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from softmac_tpu import SoftMacEnv, load

REPO = Path(__file__).resolve().parents[1]


def main(steps=50):
    """steps: env steps (reference demo uses 200; a shorter horizon keeps
    the FD evals affordable while exercising the same gradient chain)."""
    cfg = load(str(REPO / "softmac_tpu/config/demo_taco_config.py"))
    env = SoftMacEnv(cfg)
    env.set_control_mode("cloth")

    a0 = env.cloth_model.attachment_rest_positions()
    acts = np.tile(a0, (steps, 1))

    total = steps * env.substeps
    start = (9 * total // 10) // 10 * 10
    out = env.rollout_and_grad(acts, loss_start_frame=start, loss_stride=10)
    loss0 = float(out["loss"])
    g = np.asarray(out["action_grad"], np.float64)
    print(f"loss0={loss0:.4f}  |g| max={np.abs(g).max():.3e} "
          f"finite={np.isfinite(g).all()}")

    # FD on 3 coordinates with decent gradient magnitude
    flat = np.abs(g).ravel()
    coords = np.argsort(flat)[-3:]
    eps = 1e-3
    for c in coords:
        i, j = np.unravel_index(c, g.shape)
        ap = acts.copy(); ap[i, j] += eps
        am = acts.copy(); am[i, j] -= eps
        lp = float(env.rollout(ap, loss_start_frame=start, loss_stride=10)["loss"])
        lm = float(env.rollout(am, loss_start_frame=start, loss_stride=10)["loss"])
        fd = (lp - lm) / (2 * eps)
        print(f"coord ({i},{j}): analytic={g[i, j]:+.4e} fd={fd:+.4e} "
              f"ratio={g[i, j] / fd if fd else np.nan:+.3f}")

    # descent probe along the controller's actual update direction
    for scale in (1e-3, 1e-2):
        step_dir = g / max(np.abs(g).max(), 1e-12)
        l_minus = float(env.rollout(acts - scale * step_dir,
                                    loss_start_frame=start, loss_stride=10)["loss"])
        l_plus = float(env.rollout(acts + scale * step_dir,
                                   loss_start_frame=start, loss_stride=10)["loss"])
        print(f"scale {scale}: loss(-g)={l_minus:.4f} loss(+g)={l_plus:.4f} "
              f"(loss0={loss0:.4f})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50)
