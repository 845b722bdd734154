"""Taco demo (parity with reference ``soft_cloth/demo_taco.py``): optimize
cloth attachment-point trajectories (delta-parameterized with cumsum
clamping against over-stretch) so the tortilla wraps the plasticine."""
import sys
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from softmac_tpu import SoftMacEnv
from softmac_tpu.utils import (
    EpochTimer, make_gif_from_numpy, plot_loss_curve, prepare, render,
)

np.set_printoptions(precision=4)


class DeltaController:
    """Delta-action controller with the reference's cumsum clamping
    (demo_taco.py:16-77): optimizes per-step deltas, clamps deltas to
    +-0.01 and the cumulative handle displacement to the reachable arc."""

    def __init__(self, steps, actions_init, mpm_scale, lr=5e-4, warmup=5,
                 decay=0.95, betas=(0.9, 0.999)):
        import optax
        self.steps = steps
        self.actions_init = np.asarray(actions_init, np.float64)
        self.dim = self.actions_init.shape[1]
        self.delta = np.zeros((steps, self.dim))
        self.delta[1:] = self.actions_init[1:] - self.actions_init[:-1]
        self.r_max = 0.3 * mpm_scale
        self.lr, self.warmup, self.decay = lr, warmup, decay
        self.epoch = 0
        self.latest_lr = lr
        self._optax = optax
        # learning_rate as a CALLABLE reading self.lr at update time, so
        # schedule and safeguard lr-halving actually reach the optimizer
        # (a baked optax.adam(lr) ignores later self.lr changes — the
        # reference's own driver has the same latent bug, demo_taco.py:48:
        # it re-applies the constant base lr every epoch)
        self.opt = optax.adam(learning_rate=self._lr_fn, b1=betas[0],
                              b2=betas[1])
        self.opt_state = self.opt.init(self.delta)

    def _lr_fn(self, count):
        import jax.numpy as jnp
        warm = self.lr * (count + 1) / max(self.warmup, 1)
        decayed = self.lr * self.decay ** jnp.maximum(count - self.warmup, 0)
        return jnp.where(count < self.warmup, warm, decayed)

    def get_actions(self):
        return self.actions_init[0][None] + np.cumsum(self.delta, axis=0)

    def step(self, grad):
        self.latest_lr = (self.lr * (self.epoch + 1) / self.warmup
                          if self.epoch < self.warmup
                          else self.lr * self.decay ** (self.epoch - self.warmup))
        from softmac_tpu.utils import sanitize_grad
        g = sanitize_grad(np.asarray(grad, np.float64)).copy()
        g[:, 6:] = 0.0
        g[:, 2] = 0.0
        g[:, 5] = 0.0
        updates, self.opt_state = self.opt.update(g, self.opt_state, self.delta)
        self.delta = np.asarray(self._optax.apply_updates(self.delta, updates))

        # clamp (demo_taco.py:62-73)
        self.delta = np.clip(self.delta, -0.01, 0.01)
        self.delta[0] = 0.0
        cs = np.cumsum(self.delta, axis=0)
        r = self.r_max
        cs[:, 1] = np.clip(cs[:, 1], -r, r)
        cs[:, 4] = np.clip(cs[:, 4], -r, r)
        cs[:, 0] = np.minimum(cs[:, 0], np.sqrt(np.maximum(r**2 - cs[:, 1]**2, 0)) - r)
        cs[:, 3] = np.maximum(cs[:, 3], r - np.sqrt(np.maximum(r**2 - cs[:, 4]**2, 0)))
        self.delta[1:] = cs[1:] - cs[:-1]
        self.epoch += 1

    def snapshot(self):
        import copy
        return (self.delta.copy(), copy.deepcopy(self.opt_state),
                self.lr, self.epoch)

    def restore(self, snap):
        import copy
        self.delta = snap[0].copy()
        self.opt_state = copy.deepcopy(snap[1])
        self.lr, self.epoch = snap[2], snap[3]


def get_init_actions(args, env, choice=0):
    a0 = env.cloth_model.attachment_rest_positions()
    actions = np.tile(a0, (args.steps, 1))
    if choice == 1:
        # scripted fold used to generate the target (demo_taco.py:84-96)
        k = 4
        r = 0.3 / (np.pi / 2 + k - 1) * env.mpm_scale
        for i in range(args.steps):
            actions[i:, 1] += k * r / args.steps
            actions[i:, 4] += k * r / args.steps
            actions[i:, 0] -= (k - 2 + np.pi / 2) * r / args.steps
            actions[i:, 3] += (k - 2 + np.pi / 2) * r / args.steps
    return actions


LRS = np.array([2.5e-3, 5e-3, 1e-2, 2e-2])  # delta-space step sizes
                                            # (>= 1e-2 saturates the clamp
                                            # = the full Adam-style sign step)


def clamp_delta(delta, actions_init, mpm_scale):
    """The reference's delta clamps (+-0.01 per step, reachable-arc cumsum);
    returns (clamped delta, absolute trajectory)."""
    delta = np.clip(delta, -0.01, 0.01)
    delta[0] = 0.0
    cs = np.cumsum(delta, axis=0)
    r = 0.3 * mpm_scale
    cs[:, 1] = np.clip(cs[:, 1], -r, r)
    cs[:, 4] = np.clip(cs[:, 4], -r, r)
    cs[:, 0] = np.minimum(cs[:, 0], np.sqrt(np.maximum(r**2 - cs[:, 1]**2, 0)) - r)
    cs[:, 3] = np.maximum(cs[:, 3], r - np.sqrt(np.maximum(r**2 - cs[:, 4]**2, 0)))
    delta = delta.copy()
    delta[1:] = cs[1:] - cs[:-1]
    return delta, actions_init[0][None] + cs


def line_search_main(args, log_dir, env):
    """Batched backtracking line search (the demo_door driver adapted to
    the taco delta-clamp geometry): per epoch, C candidate step sizes along
    the sanitized full-horizon gradient in ONE vmap rollout, recenter on
    the argmin — monotone by construction on this knife-edge landscape
    (plain Adam re-steps from the best point overshoot at ANY lr)."""
    import jax

    from softmac_tpu.utils import sanitize_grad

    total_frames = args.steps * env.substeps
    start = (9 * total_frames // 10) // 10 * 10
    bptt = args.bptt_window if args.bptt_window > 0 else None

    def grad_at(actions):
        out = env.rollout_and_grad(actions, loss_start_frame=start,
                                   loss_stride=10, bptt_window=bptt,
                                   grad_clip=10.0)
        loss = float(out["loss"])
        g = sanitize_grad(np.asarray(out["action_grad"], np.float64)).copy()
        g[:, 6:] = 0.0
        g[:, 2] = 0.0
        g[:, 5] = 0.0
        g /= max(np.abs(g).max(), 1e-12)
        return loss, g

    actions_init = get_init_actions(args, env, choice=0)
    best = np.asarray(actions_init, np.float64)
    delta_best = np.zeros_like(best)
    delta_best[1:] = best[1:] - best[:-1]
    if args.init_actions:
        best = np.asarray(np.load(args.init_actions), np.float64)[: args.steps]
        delta_best[1:] = best[1:] - best[:-1]
    best_loss, g = grad_at(best)
    lr_scale = 1.0

    loss_log = []
    print("Optimizing Trajectory (line search)...")
    for epoch in range(args.epochs):
        timer = EpochTimer()
        timer.start("prepare"); env.reset(); timer.stop()

        timer.start("forward")
        # sign steps in DELTA space: a clamp-saturated Adam step (what
        # produced the 27509 -> 8800 jump) is approximately
        # delta -= 0.01 * sign(g_delta); g_delta = reverse-cumsum of the
        # action gradient (chain rule through the cumsum parameterization)
        g_delta = np.cumsum(g[::-1], axis=0)[::-1]
        g_delta /= max(np.abs(g_delta).max(), 1e-12)
        pairs = [clamp_delta(delta_best - lr_scale * s * np.sign(g_delta)
                             * (np.abs(g_delta) > 0.01 * np.abs(g_delta).max()),
                             actions_init, env.mpm_scale)
                 for s in LRS]
        cands = np.stack([p[1] for p in pairs])
        res = env.batched_rollout(cands, loss_start_frame=start,
                                  loss_stride=10)
        cand_losses = np.asarray(res["loss"], np.float64)
        timer.stop()
        timer.times["loss"] = timer.times["backward"] = 0.0

        timer.start("optimize")
        if np.isfinite(cand_losses).any():
            k = int(np.nanargmin(cand_losses))
        else:
            k = 0
            cand_losses = np.full_like(cand_losses, np.inf)
        if np.isfinite(cand_losses[k]) and cand_losses[k] < best_loss:
            delta_best, best = pairs[k]
            best_loss = float(cand_losses[k])
            _, g = grad_at(best)
            lr_scale = 1.0
        else:
            lr_scale *= 0.5
        timer.stop()

        timer.report(epoch, lr_scale,
                     "Loss: {:.4f} cands: {}".format(
                         best_loss,
                         np.array2string(cand_losses, precision=1)))
        loss_log.append(best_loss)
        np.save(log_dir / "ckpt" / f"actions_{epoch}.npy", best)
        np.save(log_dir / "losses.npy", np.asarray(loss_log))

        if args.render_interval > 0 and (
                (epoch + 1) % args.render_interval == 0 or epoch == 0
                or epoch == args.epochs - 1):
            images = render(env, action=best, n_steps=args.steps,
                            interval=max(args.steps // 50, 1))
            make_gif_from_numpy(images, log_dir, f"epoch{epoch}")

    plot_loss_curve(log_dir, loss_log)


def main(args):
    log_dir, cfg = prepare(args)
    if args.cloth_damping is not None:
        cfg.defrost()
        cfg.CLOTH.velocity_damping = args.cloth_damping
        cfg.freeze()
    if args.line_search and cfg.TPU.get("tile_c", "auto") == "auto":
        # The line-search driver compiles the BATCHED (vmapped) rollout;
        # at taco's (48,24,48) window the chunked g2p backward kernel
        # exceeds Mosaic's 16 MB scoped-vmem budget at the auto tile 1536
        # in that batched context (21.6 MB stack; the plain rollout fits —
        # bench.py measures it at 1536). 1024 fits with margin. env
        # SOFTMAC_TPU_TILE_C still wins over this pin (engine/env.py).
        cfg.defrost()
        cfg.TPU.tile_c = 1024
        cfg.freeze()

    env = SoftMacEnv(cfg)
    try:
        env.set_render_target(np.load("envs/taco/taco_mpm_target.npy"))
    except FileNotFoundError:
        pass
    env.set_control_mode("cloth")

    if args.eval_scripted:
        # evaluate + render the scripted fold that generated the target —
        # the loss a SOLVED taco scores (optimizer floor diagnostic)
        acts = get_init_actions(args, env, choice=1)
        total_frames = args.steps * env.substeps
        start = (9 * total_frames // 10) // 10 * 10
        out = env.rollout(acts, loss_start_frame=start, loss_stride=10)
        loss = float(out["loss"])
        print(f"scripted-fold loss: {loss:.4f}")
        np.save(log_dir / "scripted_loss.npy", np.asarray([loss]))
        images = render(env, action=acts, n_steps=args.steps,
                        interval=max(args.steps // 50, 1))
        make_gif_from_numpy(images, log_dir, "scripted")
        return

    if args.line_search:
        return line_search_main(args, log_dir, env)

    actions0 = get_init_actions(args, env, choice=0)
    if args.init_actions:
        # resume from a saved per-epoch trajectory checkpoint (the delta
        # parameterization is rebuilt from the absolute trajectory)
        actions0 = np.asarray(np.load(args.init_actions))[: args.steps]
    controller = DeltaController(
        steps=args.steps, actions_init=actions0,
        mpm_scale=env.mpm_scale, lr=args.lr, warmup=5, decay=0.95)

    bptt = args.bptt_window if args.bptt_window > 0 else None
    # --safeguard (same design as demo_pour): full-horizon taco gradients
    # point at the wrap (27509 -> 8800 in ONE epoch) but the clamp-saturated
    # Adam steps overshoot wildly on the chaotic landscape; reject an epoch
    # whose loss regresses past the best-so-far, roll the controller back,
    # and halve the lr. Costs no extra rollouts.
    best_loss, snap, g_prev = np.inf, None, None
    loss_log = []
    print("Optimizing Trajectory...")
    for epoch in range(args.epochs):
        timer = EpochTimer()
        timer.start("prepare"); env.reset(); timer.stop()

        timer.start("forward")
        acts = controller.get_actions()
        total_frames = args.steps * env.substeps
        start = (9 * total_frames // 10) // 10 * 10   # 1800 @ reference scale
        # truncated BPTT: the sticky cloth<->MPM loop makes exact long-horizon
        # adjoints explode (~1.8x/env step even with the contact-edge adjoint
        # damping; BASELINE.md). Short-window gradients stay FD-faithful, and
        # the delta-cumsum controller keeps them globally informative: an
        # early delta shifts every later handle position, so d loss/d delta_i
        # sums the (clean) late-window action gradients.
        if args.replicas > 1:
            # robustification (BASELINE.md taco notes): mean loss/grad over
            # K jitter-perturbed replicas of the initial state, all in one
            # vmap program — replica 0 stays the exact scene
            K = args.replicas
            if not hasattr(main, "_carryK"):
                main._carryK = env.jittered_carry(K, sigma=args.jitter)
            import jax
            out = env.batched_rollout_and_grad(
                np.broadcast_to(acts, (K,) + acts.shape).copy(),
                carry0=main._carryK, loss_start_frame=start, loss_stride=10,
                bptt_window=bptt, grad_clip=10.0)
            loss = float(np.mean(np.asarray(out["loss"], np.float64)))
            mean_g = np.mean(np.asarray(out["action_grad"], np.float64), 0)
            out = jax.tree.map(lambda s: np.asarray(s)[0], out)
            out["action_grad"] = mean_g
        else:
            out = env.rollout_and_grad(acts, loss_start_frame=start,
                                       loss_stride=10,
                                       bptt_window=bptt, grad_clip=10.0)
            loss = float(out["loss"])
        timer.stop()
        timer.times["loss"] = timer.times["backward"] = 0.0

        timer.start("optimize")
        g = np.asarray(out["action_grad"])
        if args.safeguard:
            if loss > best_loss and snap is not None:
                controller.restore(snap)
                controller.lr *= 0.5
                g = g_prev
                print(f"  [safeguard] overshoot ({loss:.1f} > "
                      f"{best_loss:.1f}): rolled back, lr halved")
            else:
                best_loss = loss
            snap = controller.snapshot()
            g_prev = g
        controller.step(g)
        timer.stop()

        terms = {k: float(v) for k, v in out["terms"].items()}
        timer.report(epoch, controller.latest_lr,
                     "Loss: {:.4f} chamfer: {:.4f}".format(
                         loss, terms.get("chamfer_loss", 0)))
        loss_log.append(loss)
        np.save(log_dir / "ckpt" / f"actions_{epoch}.npy", acts)
        np.save(log_dir / "losses.npy", np.asarray(loss_log))

        if args.render_interval > 0 and (
                (epoch + 1) % args.render_interval == 0 or epoch == 0):
            images = render(env, action=acts, n_steps=args.steps,
                            interval=max(args.steps // 50, 1))
            make_gif_from_numpy(images, log_dir, f"epoch{epoch}")

    plot_loss_curve(log_dir, loss_log)


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--exp-name", "-n", type=str, default="taco")
    parser.add_argument("--config", type=str,
                        default=str(Path(__file__).resolve().parents[1]
                                    / "softmac_tpu/config/demo_taco_config.py"))
    parser.add_argument("--render-interval", type=int, default=5)
    parser.add_argument("--init-actions", type=str, default=None,
                        help="resume from a saved ckpt/actions_*.npy")
    parser.add_argument("--epochs", type=int, default=25)
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--replicas", type=int, default=1,
                        help="optimize mean loss over K jittered replicas")
    parser.add_argument("--jitter", type=float, default=2e-4,
                        help="initial-position jitter sigma for --replicas")
    parser.add_argument("--lr", type=float, default=0.3,
                        help="reference demo_taco lr (its Adam steps "
                             "saturate the +-0.01 delta clamp)")
    parser.add_argument("--cloth-damping", type=float, default=None,
                        help="override CLOTH.velocity_damping (0.05 keeps "
                             "the wrap states stable; default config 0.02)")
    parser.add_argument("--bptt-window", type=int, default=None,
                        help="truncated-BPTT window (env steps); 0 = full. "
                             "Default: 20 with Adam, 0 (full horizon) with "
                             "--line-search — the solving recipe needs "
                             "untruncated gradients for its step direction")
    parser.add_argument("--line-search", action="store_true",
                        help="batched candidate-step line search (the "
                             "demo_door driver) instead of Adam; implies "
                             "full-horizon gradients unless --bptt-window "
                             "is given explicitly")
    parser.add_argument("--safeguard", action="store_true",
                        help="best-so-far rollback + lr halving on "
                             "overshoot (see demo_pour)")
    parser.add_argument("--eval-scripted", action="store_true",
                        help="evaluate + render the scripted fold that "
                             "generated the target, then exit")
    args = parser.parse_args()
    if args.bptt_window is None:
        # the line-search recipe needs the full-horizon gradient direction
        # (ADVICE r3: a silently truncated window degrades it)
        args.bptt_window = 0 if args.line_search else 20
    main(args)
