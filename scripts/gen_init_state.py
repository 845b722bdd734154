"""Regenerate the packed initial particle states for the pour / grip scenes.

The reference ships these as opaque .npy files and only hints at their
origin in commented-out code (softmac/demo_pour.py:81-93, demo_grip.py:66-77:
run the scene forward from a raw sampled shape, then ``get_state`` →
``np.save``). This script is the working version of that flow for the TPU
engine: sample a fresh box of material where the scene expects it, settle it
under gravity + contact for a few hundred steps with held rigid bodies, and
save the packed (N, 24) state plus the target-position file.

The regenerated states are physically equivalent but not bit-identical to
the reference's (different engine); by default they are written next to the
originals with a ``_regen`` suffix. Pass --overwrite to replace the
canonical files the demo configs point at.

Usage:
    python scripts/gen_init_state.py pour [--steps 600] [--overwrite]
    python scripts/gen_init_state.py grip [--steps 200] [--overwrite]
"""
import sys
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

REPO = Path(__file__).resolve().parents[1]

# Generator shapes: a raw box of material roughly where the settled state
# should end up (extents read off the shipped states; see --inspect).
SCENES = {
    "pour": {
        "config": "softmac_tpu/config/demo_pour_config.py",
        "shape": {"shape": "box", "width": (0.10, 0.14, 0.10),
                  "init_pos": [0.70, 0.26, 0.50], "n_particles": 5000,
                  "color": 0, "init_rot": None},
        "steps": 600,
        "out": ("envs/pour/pour_mpm_init_state_corotated.npy",
                "envs/pour/pour_mpm_target_position_corotated.npy"),
    },
    "grip": {
        "config": "softmac_tpu/config/demo_grip_config.py",
        "shape": {"shape": "box", "width": (0.16, 0.156, 0.16),
                  "init_pos": [0.50, 0.117, 0.50], "n_particles": 10000,
                  "color": 0, "init_rot": None},
        "steps": 200,
        "out": ("envs/grip/grip_mpm_init_state.npy",
                "envs/grip/grip_mpm_target_position.npy"),
    },
}


def main():
    ap = ArgumentParser()
    ap.add_argument("scene", choices=sorted(SCENES))
    ap.add_argument("--steps", type=int, default=None,
                    help="settle steps (default: per-scene)")
    ap.add_argument("--overwrite", action="store_true",
                    help="write the canonical files instead of *_regen.npy")
    args = ap.parse_args()

    from softmac_tpu import SoftMacEnv, load

    spec = SCENES[args.scene]
    cfg = load(str(REPO / spec["config"]))
    cfg.defrost()
    cfg.SHAPES = [dict(spec["shape"])]
    # losses read target files that may not exist yet; settle without them
    env = SoftMacEnv(cfg, loss=False, search_dirs=[str(REPO)])

    steps = args.steps or spec["steps"]
    zero = np.zeros(max(env.action_dim, 1))
    if env.rigid_model is not None and env.action_dim:
        # hold the rigid bodies against gravity + contact while settling
        actions = env.adjust_action_with_ext_force(
            np.zeros((steps, env.action_dim)))
    else:
        actions = np.tile(zero, (steps, 1))

    env.reset()
    for i in range(steps):
        env.step(actions[i])
        if (i + 1) % 100 == 0:
            v = np.abs(np.asarray(env._carry[0].v))
            print(f"step {i+1}/{steps}: |v|max={v.max():.4f}")

    state = env.get_state()[:, :24]
    suffix = "" if args.overwrite else "_regen"
    out_state = REPO / (spec["out"][0][:-4] + suffix + ".npy")
    out_target = REPO / (spec["out"][1][:-4] + suffix + ".npy")
    np.save(out_state, state)
    np.save(out_target, state[:, :3])
    print(f"saved {out_state} {state.shape}")
    print(f"saved {out_target} {state[:, :3].shape}")


if __name__ == "__main__":
    main()
