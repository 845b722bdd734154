"""Door demo (parity with reference ``softmac/demo_door.py``): MPM-controlled
elastic boxes push a revolute door to a target angle. Uses per-particle
controllers (control_mode="mpm") and the 1/40 mpm->rigid gradient damping
the reference hardcodes (demo_door.py:116, set via RIGID.ext_grad_scale)."""
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


def get_init_actions(args, choice=1):
    actions = np.zeros((args.steps, 3))
    if choice == 1:
        actions[:, 2] = 0.1
    return actions


def main(args):
    log_dir, cfg = prepare(args)

    env = SoftMacEnv(cfg)
    env.set_control_idx(np.zeros(env.n_particles, np.int32))  # all on ctrl 0

    controller = Controller(
        num_actions=args.steps // 20, action_dim=3, steps=args.steps,
        lr=1e-1, warmup=5, decay=0.99, betas=(0.5, 0.999),
        actions_init=get_init_actions(args, choice=1))

    loss_log = []
    print("Optimizing Trajectory...")
    for epoch in range(args.epochs):
        timer = EpochTimer()
        timer.start("prepare"); env.reset(); timer.stop()

        timer.start("forward")
        acts = controller.get_actions()
        total_frames = args.steps * env.substeps
        start = (2 * total_frames // 3) // 20 * 20   # 2000 @ reference scale
        # full-horizon gradients: finite with implicit hinge damping; the
        # useful signal flows from the early pushes to the late pose loss
        # (truncation would zero it — no contact in the late windows)
        out = env.rollout_and_grad(acts, loss_start_frame=start, loss_stride=20)
        loss = float(out["loss"])
        timer.stop()
        timer.times["loss"] = timer.times["backward"] = 0.0

        timer.start("optimize")
        g = np.asarray(out["action_grad"]).copy()
        g[:, 1] *= 0.0  # reference zeroes the y-gradient (demo_door.py:60)
        controller.step(g)
        timer.stop()

        terms = {k: float(v) for k, v in out["terms"].items()}
        timer.report(epoch, controller.latest_lr,
                     "Loss: {:.4f} pose: {:.4f} vel: {:.4f} contact: {:.4f}".format(
                         loss, terms.get("pose_loss", 0), terms.get("vel_loss", 0),
                         terms.get("contact_loss", 0)))
        print("Final pose: {:.4f} vel: {:.4f} contact: {:.4f}".format(
            terms.get("final_pose_loss", 0), terms.get("final_vel_loss", 0),
            terms.get("final_contact_loss", 0)))
        rigid = np.asarray(out["carry"][2].q)
        print("Door angle: {:.4f} rad".format(float(rigid[0])))
        loss_log.append(loss)
        np.save(log_dir / "ckpt" / f"actions_{epoch}.npy", acts)

        if (epoch + 1) % args.render_interval == 0 or epoch == 0:
            images = render(env, action=acts, n_steps=args.steps,
                            interval=args.steps // 50)
            make_gif_from_numpy(images, log_dir, f"epoch{epoch}")

    plot_loss_curve(log_dir, loss_log)


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--exp-name", "-n", type=str, default="door")
    parser.add_argument("--config", type=str,
                        default=str(Path(__file__).resolve().parents[1]
                                    / "softmac_tpu/config/demo_door_config.py"))
    parser.add_argument("--render-interval", type=int, default=5)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--steps", type=int, default=3000)
    args = parser.parse_args()
    main(args)
