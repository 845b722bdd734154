"""Shared demo utilities (parity with reference ``softmac/utils.py``):
GIF writers, rollout rendering, log-dir preparation, loss-curve plotting,
and the optax-based trajectory controller that replaces the reference's
torch.Adam controllers."""
from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path

import numpy as np


# ===============================
# Rendering
# ===============================
def make_gif_from_numpy(images, logdir, name=None):
    import imageio.v2 as imageio
    gif_name = "movie.gif" if name is None else name + ".gif"
    with imageio.get_writer(Path(logdir) / gif_name, mode="I", loop=0) as writer:
        for image in images:
            writer.append_data(image)


def make_gif_from_files(picture_dir, logdir, name=None):
    """Assemble a GIF from per-frame image files (reference
    ``softmac/utils.py:11-20``): every ``*.png``/``*.jpg`` under
    ``picture_dir``, in sorted filename order."""
    import imageio.v2 as imageio
    files = sorted(p for p in Path(picture_dir).iterdir()
                   if p.suffix.lower() in (".png", ".jpg", ".jpeg"))
    make_gif_from_numpy([imageio.imread(f) for f in files], logdir, name)


def render(env, action=None, n_steps=100, interval=10):
    """Re-roll (or replay) the env and collect frames (utils.py:29-47)."""
    print("Rendering...")
    interval = max(int(interval), 1)   # demos pass steps//50; guard short runs
    image_list = []
    if action is not None:
        env.reset()
        for i in range(n_steps):
            env.step(action[i])
            if i % interval == 0:
                image_list.append(env.render(env.cur))
    else:
        for i in range(0, n_steps, interval):
            image_list.append(env.render(i * env.substeps))
    return image_list


# ===============================
# Preparation / logging
# ===============================
def prepare(args):
    Path("logs/").mkdir(exist_ok=True)
    log_dir = Path("logs/") / args.exp_name
    log_dir.mkdir(exist_ok=True)
    from softmac_tpu.config import load
    cfg = load(args.config)
    try:
        shutil.copy(args.config, log_dir / "config.py")
    except (OSError, shutil.SameFileError):
        pass
    with open(log_dir / "args.json", "wt") as f:
        json.dump({k: str(v) for k, v in vars(args).items()}, f, indent=4)
    (log_dir / "ckpt").mkdir(exist_ok=True)
    return log_dir, cfg


def plot_loss_curve(log_dir, loss_log):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.ticker import ScalarFormatter

    fig, ax = plt.subplots(figsize=(4, 3))
    plt.plot(loss_log, color="#c11221")
    plt.xlabel("Epochs", fontsize=14)
    formatter = ScalarFormatter(useMathText=True)
    formatter.set_scientific(True)
    formatter.set_powerlimits((-1, 1))
    ax.yaxis.set_major_formatter(formatter)
    plt.ylabel("Loss", fontsize=14)
    plt.tight_layout()
    plt.savefig(Path(log_dir) / "loss_curve.png", dpi=300)
    plt.close()
    np.save(Path(log_dir) / "losses.npy", np.array(loss_log))


# ===============================
# Trajectory controller (optax Adam; replaces torch controllers)
# ===============================
def sanitize_grad(g: np.ndarray) -> np.ndarray:
    """Zero non-finite gradient entries (warn once per call site).

    Long contact-rich rollouts can overflow the backward pass even when the
    forward stays finite (the reference's Taichi grads share this failure
    mode); a single NaN epoch must not poison the Adam state and all later
    actions, so the controller drops those entries instead of applying them.
    """
    bad = ~np.isfinite(g)
    if bad.any():
        print(f"[controller] WARNING: {bad.sum()}/{g.size} non-finite gradient "
              "entries zeroed (backward overflow on a long horizon?)")
        g = np.where(bad, 0.0, g)
    return g



class Controller:
    """Action-trajectory optimizer: Adam over (num_actions, dim) with the
    reference's warmup/decay schedule and repeat-expansion to env steps."""

    def __init__(self, num_actions, action_dim, steps, lr=1e-2, warmup=5,
                 decay=1.0, betas=(0.9, 0.999), action_scale=None,
                 actions_init=None):
        import optax

        self.num_actions = num_actions
        self.action_dim = action_dim
        self.steps = steps
        self.lr = lr
        self.warmup = warmup
        self.decay = decay
        self.epoch = 0
        self.latest_lr = lr

        if actions_init is not None:
            a = np.asarray(actions_init, np.float64)
            if a.shape[0] > num_actions:
                a = a.reshape(num_actions, -1, a.shape[-1]).mean(axis=1)
            self.action = a.copy()
        else:
            self.action = np.zeros((num_actions, action_dim))
        self.action_scale = (np.ones(action_dim) if action_scale is None
                             else np.asarray(action_scale, np.float64))

        self._optax = optax
        self.optimizer = optax.adam(learning_rate=self._lr_fn, b1=betas[0], b2=betas[1])
        self.opt_state = self.optimizer.init(self.action)

    def _lr_fn(self, count):
        import jax.numpy as jnp
        e = count
        warm = self.lr * (e + 1) / max(self.warmup, 1)
        decayed = self.lr * self.decay ** jnp.maximum(e - self.warmup, 0)
        return jnp.where(e < self.warmup, warm, decayed)

    def schedule_lr(self):
        e = self.epoch
        if e < self.warmup:
            self.latest_lr = self.lr * (e + 1) / max(self.warmup, 1)
        else:
            self.latest_lr = self.lr * self.decay ** (e - self.warmup)

    def get_actions(self):
        acts = self.action * self.action_scale
        reps = self.steps // self.num_actions
        return np.repeat(acts, reps, axis=0)

    def set_actions(self, actions):
        """Restore an action trajectory (backtracking / checkpoint resume).
        Accepts the compact (num_actions, dim) array or the expanded
        (steps, dim) one (averaged back per control interval)."""
        a = np.asarray(actions, np.float64)
        if a.shape[0] > self.num_actions:
            a = a.reshape(self.num_actions, -1, self.action_dim).mean(axis=1)
        scale = np.where(self.action_scale == 0, 1.0, self.action_scale)
        self.action = (a / scale).copy()

    def step(self, grad):
        """grad: (steps, dim) gradient w.r.t. expanded actions."""
        self.schedule_lr()
        g = sanitize_grad(np.asarray(grad, np.float64)) * self.action_scale
        g = g.reshape(self.num_actions, -1, self.action_dim).mean(axis=1)
        updates, self.opt_state = self.optimizer.update(g, self.opt_state, self.action)
        self.action = np.asarray(self._optax.apply_updates(self.action, updates))
        self.epoch += 1

    def snapshot(self):
        """Full optimizer state (actions + Adam moments + schedule epoch +
        base lr) for overshoot rejection (demo_pour --safeguard)."""
        import copy
        return (self.action.copy(), copy.deepcopy(self.opt_state),
                self.epoch, self.lr)

    def restore(self, snap):
        self.action = snap[0].copy()
        import copy
        self.opt_state = copy.deepcopy(snap[1])
        self.epoch = snap[2]
        self.lr = snap[3]

    def save(self, path):
        """Persist the full optimizer state (actions + Adam moments +
        schedule position) so an optimization resumes EXACTLY. The
        reference checkpoints only the action trajectory per epoch
        (soft_cloth/demo_taco.py:127); this also keeps the moments."""
        np.save(path, np.array(self.snapshot(), dtype=object),
                allow_pickle=True)

    def load(self, path):
        # np.save appends ".npy" when missing; mirror that here
        path = str(path)
        if not path.endswith(".npy") and not Path(path).exists():
            path += ".npy"
        self.restore(tuple(np.load(path, allow_pickle=True)))


class EpochTimer:
    """Per-epoch phase timing printout (demo_pour.py:155-193 format)."""

    def __init__(self):
        self.times = {}
        self._t0 = None
        self._phase = None

    def start(self, phase):
        self._t0 = time.time()
        self._phase = phase

    def stop(self):
        self.times[self._phase] = time.time() - self._t0

    def report(self, epoch, lr, loss_line=""):
        t = self.times
        total = sum(t.values())
        print(f"+============== Epoch {epoch} ==============+ lr: {lr:.4f}")
        print("Time: total {:.2f}, pre {:.2f}, forward {:.2f}, loss {:.2f}, "
              "backward {:.2f}, optimize {:.2f}".format(
                  total, t.get("prepare", 0), t.get("forward", 0),
                  t.get("loss", 0), t.get("backward", 0), t.get("optimize", 0)))
        if loss_line:
            print(loss_line)
