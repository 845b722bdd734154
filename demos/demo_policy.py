"""Closed-loop neural-policy demo: train a flax MLP (obs -> action) through
the differentiable rollout with analytic simulation gradients.

The reference ships this capability as dead code (``soft_cloth/engine/nn/
mlp.py`` imports a nonexistent class and uses the removed
``ti.complex_kernel``; SURVEY §2.2 #23). This driver is the working
equivalent on the pour_vel scene: at every env step the policy maps the
observation (subsampled particle x/v + body states, the reference's
get_observation layout) to the 12-dim velocity command, and Adam ascends
d(loss)/d(params) obtained by jax.grad straight through physics.

After training, the policy is rolled out CLOSED-LOOP through the imperative
facade (env.reset/get_observation/step) — the deployment path — and the
resulting trajectory is rendered to a GIF.
"""
import sys
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np
import optax

from softmac_tpu import SoftMacEnv
from softmac_tpu.engine.policy import MLPPolicy, make_closed_loop_rollout
from softmac_tpu.utils import (
    EpochTimer, make_gif_from_numpy, plot_loss_curve, prepare, render,
)

np.set_printoptions(precision=4)


def main(args):
    log_dir, cfg = prepare(args)

    env = SoftMacEnv(cfg)
    try:
        env.set_render_target(
            np.load("envs/pour/pour_mpm_target_position_corotated.npy"))
    except FileNotFoundError:
        pass

    hidden = tuple(int(h) for h in args.hidden.split(",") if h)
    policy = MLPPolicy(hidden_dims=hidden, action_dim=env.action_dim,
                       action_scale=args.action_scale)
    # the observation layout must match env.get_observation (the deployment
    # path below), which reads ENV.n_observed_particles from the config
    n_observed = int(cfg.ENV.n_observed_particles)
    loss_fn, init_params = make_closed_loop_rollout(
        env, policy, n_steps=args.steps, n_observed=n_observed)
    params = init_params(jax.random.PRNGKey(args.seed))

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    grad_fn = jax.value_and_grad(loss_fn)

    loss_log = []
    print("Training policy...")
    for epoch in range(args.epochs):
        timer = EpochTimer()
        timer.start("prepare"); timer.stop()
        timer.start("forward")
        loss, g = grad_fn(params)
        loss = float(loss)
        timer.stop()
        timer.times["loss"] = timer.times["backward"] = 0.0

        timer.start("optimize")
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        timer.stop()

        timer.report(epoch, args.lr, "Loss: {:.4f}".format(loss))
        loss_log.append(loss)
        from flax import serialization
        (log_dir / "ckpt" / f"policy_{epoch}.msgpack").write_bytes(
            serialization.to_bytes(params))

        if args.render_interval > 0 and (
                (epoch + 1) % args.render_interval == 0
                or epoch == args.epochs - 1):
            # deployment path: closed-loop through the imperative facade
            env.reset()
            acts = []
            for _ in range(args.steps):
                obs = env.get_observation()
                a = np.asarray(policy.apply(params, obs))
                acts.append(a)
                env.step(a)
            acts = np.stack(acts)
            np.save(log_dir / "ckpt" / f"actions_{epoch}.npy", acts)
            # frames come from the deployment rollout's recorded history —
            # no second simulation pass (action=None replays nothing)
            images = render(env, action=None, n_steps=args.steps,
                            interval=max(args.steps // 50, 1))
            make_gif_from_numpy(images, log_dir, f"epoch{epoch}")

    plot_loss_curve(log_dir, loss_log)


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--exp-name", "-n", type=str, default="policy")
    parser.add_argument("--config", type=str,
                        default=str(Path(__file__).resolve().parents[1]
                                    / "softmac_tpu/config/demo_pour_vel_config.py"))
    parser.add_argument("--render-interval", type=int, default=10)
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--hidden", type=str, default="64,64")
    parser.add_argument("--lr", type=float, default=3e-3)
    parser.add_argument("--action-scale", type=float, default=1.0)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    main(args)
