"""Trace door forward state health (NaN / window-exit hunt)."""
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
    env.set_control_idx(np.zeros(env.n_particles, np.int32))
    env.reset()
    action = np.zeros(3)
    action[2] = 0.1
    for i in range(steps):
        env.step(action)
        if (i + 1) % 100 == 0:
            mpm = env._carry[0]
            x = np.asarray(mpm.x)
            v = np.asarray(mpm.v)
            F = np.asarray(mpm.F)
            q = np.asarray(env._carry[2].q) if hasattr(env._carry[2], "q") else None
            print(f"step {i+1}: x[min,max]=({x.min():.3f},{x.max():.3f}) "
                  f"|v|max={np.abs(v).max():.3e} |F|max={np.abs(F).max():.3e} "
                  f"nan(x,v,F)=({np.isnan(x).sum()},{np.isnan(v).sum()},{np.isnan(F).sum()})"
                  + (f" q={q}" if q is not None else ""))
            if np.isnan(x).any() or np.isnan(F).any():
                break


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2000)
