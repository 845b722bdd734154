"""Grip demo (parity with reference ``softmac/demo_grip.py``): two prismatic
fingers squeeze a plasticine block toward a target shape. Palm contact is
disabled exactly as in the reference (demo_grip.py:117)."""
import sys
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from softmac_tpu import SoftMacEnv
from softmac_tpu.utils import (
    Controller, EpochTimer, make_gif_from_numpy, plot_loss_curve, prepare, render,
)

np.set_printoptions(precision=4)


def get_init_actions(args, choice=2):
    if choice == 0:
        return np.zeros((args.steps, 2))
    scale = 1.2 if choice == 1 else 0.3
    return np.ones((args.steps, 2)) * np.array([1.0, -1.0]) * scale


def main(args):
    log_dir, cfg = prepare(args)

    env = SoftMacEnv(cfg)
    try:
        env.set_render_target(np.load("envs/grip/grip_mpm_target_position.npy"))
    except FileNotFoundError:
        pass
    env.set_primitives_contact([False, True, True])  # palm contact off

    actions0 = get_init_actions(args, choice=2)
    if args.init_actions:
        # resume from a saved per-epoch trajectory checkpoint
        actions0 = np.asarray(np.load(args.init_actions))[: args.steps]
    controller = Controller(
        num_actions=args.steps // 10, action_dim=2, steps=args.steps,
        lr=1e-1, warmup=5, decay=0.99, betas=(0.5, 0.999),
        actions_init=actions0)

    loss_log = []
    print("Optimizing Trajectory...")
    for epoch in range(args.epochs):
        timer = EpochTimer()
        timer.start("prepare"); env.reset(); timer.stop()

        timer.start("forward")
        acts = controller.get_actions()
        total_frames = args.steps * env.substeps
        start = (3 * total_frames // 4) // 20 * 20   # 1500 @ reference scale
        out = env.rollout_and_grad(acts, loss_start_frame=start, loss_stride=20,
                                   remat=args.remat)
        loss = float(out["loss"])
        timer.stop()
        timer.times["loss"] = timer.times["backward"] = 0.0

        timer.start("optimize")
        controller.step(np.asarray(out["action_grad"]))
        timer.stop()

        terms = {k: float(v) for k, v in out["terms"].items()}
        timer.report(epoch, controller.latest_lr,
                     "Loss: {:.4f} pose: {:.4f} vel: {:.4f} chamfer: {:.4f}".format(
                         loss, terms.get("pose_loss", 0), terms.get("vel_loss", 0),
                         terms.get("chamfer_loss", 0)))
        print("Final pose: {:.4f} vel: {:.4f} chamfer: {:.4f}".format(
            terms.get("final_pose_loss", 0), terms.get("final_vel_loss", 0),
            terms.get("final_chamfer_loss", 0)))
        rigid = np.asarray(out["carry"][2].q)
        print("Rigid x: {} v: {}".format(rigid, np.asarray(out["carry"][2].qd)))
        loss_log.append(loss)
        np.save(log_dir / "ckpt" / f"actions_{epoch}.npy", acts)

        if args.render_interval > 0 and (
                (epoch + 1) % args.render_interval == 0 or epoch == 0):
            images = render(env, action=acts, n_steps=args.steps,
                            interval=args.steps // 50)
            make_gif_from_numpy(images, log_dir, f"epoch{epoch}")

    plot_loss_curve(log_dir, loss_log)


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--exp-name", "-n", type=str, default="grip")
    parser.add_argument("--config", type=str,
                        default=str(Path(__file__).resolve().parents[1]
                                    / "softmac_tpu/config/demo_grip_config.py"))
    parser.add_argument("--render-interval", type=int, default=5)
    parser.add_argument("--init-actions", type=str, default=None,
                        help="resume from a saved ckpt/actions_*.npy")
    parser.add_argument("--remat", type=str, default="step",
                        help="rollout remat policy: step | none | window:K "
                             "(scripts/diag_remat.py for the A/B)")
    parser.add_argument("--epochs", type=int, default=15)
    parser.add_argument("--steps", type=int, default=400)
    args = parser.parse_args()
    main(args)
