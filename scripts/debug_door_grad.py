"""Check door full-horizon gradient finiteness (NaN hunt for demo_door).

Runs rollout_and_grad at the demo's init actions for a given number of env
steps and reports the gradient's finiteness and norm. Used to verify the
AD-safe influence fix in contact.py (exp overflow under deep penetration).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from softmac_tpu import SoftMacEnv
from softmac_tpu.config import load

ROOT = Path(__file__).resolve().parents[1]


def main(steps: int):
    cfg = load(str(ROOT / "softmac_tpu/config/demo_door_config.py"))
    env = SoftMacEnv(cfg)
    control_idx = np.zeros(env.n_particles, np.int32)
    env.set_control_idx(control_idx)

    actions = np.zeros((steps, 3))
    actions[:, 2] = 0.1  # the demo's init push (demo_door.py init actions)

    total_frames = steps * env.substeps
    start = (2 * total_frames // 3) // 20 * 20
    out = env.rollout_and_grad(actions, loss_start_frame=start, loss_stride=20)
    g = np.asarray(out["action_grad"])
    bad = ~np.isfinite(g)
    print(f"steps={steps} loss={float(out['loss']):.6f} "
          f"terms={ {k: float(v) for k, v in out['terms'].items()} }")
    print(f"grad: nonfinite={bad.sum()}/{g.size} "
          f"|g|max={np.abs(g[np.isfinite(g)]).max() if np.isfinite(g).any() else float('nan'):.3e} "
          f"norm={np.linalg.norm(np.nan_to_num(g)):.3e}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3000)
