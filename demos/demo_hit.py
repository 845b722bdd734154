"""Hit demo (parity with reference ``soft_cloth/demo_hit.py``): MPM-controlled
chopstick cylinders hit a hanging towel toward a rotated target pose. Loss is
evaluated at the final frame only; the towel target is generated from the
rest mesh if absent (reference set_target, demo_hit.py:69-78)."""
import sys
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from softmac_tpu import SoftMacEnv
from softmac_tpu.engine.meshio import load_obj
from softmac_tpu.utils import (
    Controller, EpochTimer, make_gif_from_numpy, plot_loss_curve, prepare, render,
)

np.set_printoptions(precision=4)
ROOT = Path(__file__).resolve().parents[1]


def ensure_target():
    out = ROOT / "envs/mpm2towel/towel_target_45.npy"
    if out.exists():
        return
    out.parent.mkdir(parents=True, exist_ok=True)
    theta = -np.pi / 4 * 0.8
    rot = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]])
    v, _ = load_obj(ROOT / "envs/assets/towel/towel.obj")
    v = v + np.array([0.0, 0.0, -0.1])
    v[:, 1:] = (v[:, 1:] - v[0, 1:]) @ rot + v[0, 1:]
    np.save(out, v)


def main(args):
    ensure_target()
    log_dir, cfg = prepare(args)

    env = SoftMacEnv(cfg)
    env.set_render_target(np.load(ROOT / "envs/mpm2towel/towel_target_45.npy"))
    control_idx = np.full(env.n_particles, -1, np.int32)
    control_idx[:4000] = 0   # the two cylinders are controlled
    env.set_control_idx(control_idx)

    actions0 = np.zeros((args.steps, 3))
    actions0[:, 2] = -8.0
    if args.init_actions:
        # resume from a saved trajectory (reference demo_hit.py:85 loads
        # ckpt "actions_24.pt"; ours are the per-epoch ckpt/actions_*.npy)
        actions0 = np.asarray(np.load(args.init_actions))[: args.steps]
        assert actions0.shape == (args.steps, 3), actions0.shape
    # separate optimizers: xy at 0.1x lr, z at full lr (demo_hit.py:44-54)
    xy_ctl = Controller(args.steps, 2, args.steps, lr=0.8 * 0.1, warmup=5,
                        decay=0.99, actions_init=actions0[:, :2])
    z_ctl = Controller(args.steps, 1, args.steps, lr=0.8, warmup=5,
                       decay=0.99, actions_init=actions0[:, 2:])

    loss_log = []
    print("Optimizing Trajectory...")
    for epoch in range(args.epochs):
        timer = EpochTimer()
        timer.start("prepare"); env.reset(); timer.stop()

        timer.start("forward")
        acts = np.concatenate([xy_ctl.get_actions(), z_ctl.get_actions()], axis=1)
        total_frames = args.steps * env.substeps
        out = env.rollout_and_grad(acts, loss_start_frame=total_frames,
                                   loss_stride=total_frames,
                                   remat=args.remat)
        loss = float(out["loss"])
        timer.stop()
        timer.times["loss"] = timer.times["backward"] = 0.0

        timer.start("optimize")
        g = np.clip(np.asarray(out["action_grad"]), -1.0, 1.0)
        xy_ctl.step(g[:, :2])
        z_ctl.step(g[:, 2:])
        timer.stop()

        terms = {k: float(v) for k, v in out["terms"].items()}
        timer.report(epoch, z_ctl.latest_lr,
                     "Loss: {:.4f} pose: {:.4f}".format(
                         loss, terms.get("pose_loss", 0)))
        loss_log.append(loss)
        np.save(log_dir / "ckpt" / f"actions_{epoch}.npy", acts)

        if args.render_interval > 0 and (
                (epoch + 1) % args.render_interval == 0 or epoch == 0):
            images = render(env, action=acts, n_steps=args.steps,
                            interval=max(args.steps // 50, 1))
            make_gif_from_numpy(images, log_dir, f"epoch{epoch}")

    plot_loss_curve(log_dir, loss_log)


if __name__ == "__main__":
    """Gradient for this demo is not stable... (reference demo_hit.py:209)"""
    parser = ArgumentParser()
    parser.add_argument("--exp-name", "-n", type=str, default="hit")
    parser.add_argument("--config", type=str,
                        default=str(Path(__file__).resolve().parents[1]
                                    / "softmac_tpu/config/demo_hit_config.py"))
    parser.add_argument("--render-interval", type=int, default=5)
    parser.add_argument("--remat", type=str, default="step",
                        help="rollout remat policy: step | none | window:K "
                             "(scripts/diag_remat.py for the A/B)")
    parser.add_argument("--epochs", type=int, default=40)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--init-actions", type=str, default=None,
                        help="resume from a saved ckpt/actions_*.npy")
    args = parser.parse_args()
    main(args)
