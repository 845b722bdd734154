"""Pour demo with velocity-controlled rigid bodies (parity with reference
``softmac/demo_pour_vel.py``): optimize a 12-dim velocity-command trajectory
so the glass pours the liquid into the bowl.

The epoch loop matches the reference's structure (reset / forward / loss /
backward / optimize with per-phase timings), but forward+loss+backward is ONE
jitted differentiable rollout on the TPU."""
import sys
import time
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from softmac_tpu import SoftMacEnv
from softmac_tpu.utils import (
    Controller, EpochTimer, make_gif_from_numpy, plot_loss_curve, prepare, render,
)

np.set_printoptions(precision=4)


def main(args):
    log_dir, cfg = prepare(args)

    env = SoftMacEnv(cfg)
    try:
        env.set_render_target(np.load("envs/pour/pour_mpm_target_position_corotated.npy"))
    except FileNotFoundError:
        pass

    # action layout per primitive: [w(3), v(3)]; scale mirrors reference
    # demo_pour_vel.py:23-25 (glass wz, vx, vy only)
    action_scale = np.array([0., 0., 10., 0.5, 0.5, 0., 0., 0., 0., 0., 0., 0.])
    controller = Controller(
        num_actions=100, action_dim=12, steps=args.steps, lr=3e-2,
        warmup=5, decay=1.0, action_scale=action_scale)

    loss_log = []
    print("Optimizing Trajectory...")
    for epoch in range(args.epochs):
        timer = EpochTimer()
        timer.start("prepare")
        env.reset()
        timer.stop()

        timer.start("forward")
        actions = controller.get_actions()
        # bptt_window: f32 gradients through >~500 chaotic liquid steps are
        # sign-noise at 1e11 (f64 is clean); 300-step truncation recovers the
        # f64 gradient structure (97% sign agreement)
        out = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=20,
                                   bptt_window=300, remat=args.remat)
        loss = float(out["loss"])
        timer.stop()
        timer.times["loss"] = timer.times["backward"] = 0.0

        timer.start("optimize")
        controller.step(np.asarray(out["action_grad"]))
        timer.stop()

        terms = {k: float(v) for k, v in out["terms"].items()}
        timer.report(epoch, controller.latest_lr,
                     "Loss: {:.4f} chamfer: {:.4f} pose: {:.4f} vel: {:.4f}".format(
                         loss, terms.get("chamfer_loss", 0),
                         terms.get("pose_loss", 0), terms.get("vel_loss", 0)))
        print("Final chamfer: {:.4f} pose: {:.4f} vel: {:.4f}".format(
            terms.get("final_chamfer_loss", 0), terms.get("final_pose_loss", 0),
            terms.get("final_vel_loss", 0)))
        loss_log.append(loss)
        np.save(log_dir / "ckpt" / f"actions_{epoch}.npy", controller.action)

        if args.render_interval > 0 and (
                (epoch + 1) % args.render_interval == 0 or epoch == 0):
            images = render(env, action=controller.get_actions(),
                            n_steps=args.steps, interval=args.steps // 50)
            make_gif_from_numpy(images, log_dir, f"epoch{epoch}")

    plot_loss_curve(log_dir, loss_log)


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--exp-name", "-n", type=str, default="pour_vel")
    parser.add_argument("--config", type=str,
                        default=str(Path(__file__).resolve().parents[1]
                                    / "softmac_tpu/config/demo_pour_vel_config.py"))
    parser.add_argument("--render-interval", type=int, default=5)
    parser.add_argument("--remat", type=str, default="step",
                        help="rollout remat policy: step | none | window:K "
                             "(scripts/diag_remat.py for the A/B)")
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--steps", type=int, default=2000)
    args = parser.parse_args()
    main(args)
