"""Body-body contact demo: drop the pour scene's glass onto the bowl.

The reference gets skeleton-vs-skeleton contact from the Jade/DART world
(``softmac/engine/rigid_simulator.py:17-45``); no shipped reference
trajectory ever makes two bodies touch, so this extension scene exists to
exercise the rebuild's differentiable penalty equivalent
(``RIGID.body_contact``): the glass free-falls (zero actions, no gravity
compensation), clinks onto the bowl rim, and comes to rest supported by it
— with the flag off it falls straight through.

Usage: python scripts/demo_body_contact.py [--render] [--steps N]
Writes logs/body_contact/{trajectory.npy, body_contact.gif}.
"""
import argparse
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

_NO_STICK = False


def build_env(body_contact: bool):
    from softmac_tpu import SoftMacEnv, load

    cfg = load(str(ROOT / "softmac_tpu/config/demo_pour_config.py"))
    cfg.defrost()
    cfg.RIGID.body_contact = body_contact
    # settle-friendly contact constants (the default damping 10 leaves the
    # clink bouncy for seconds; see tests/test_rigid_contact.py)
    cfg.RIGID.body_contact_stiffness = 5e4
    cfg.RIGID.body_contact_damping = 100.0
    # static-friction stick (round 5): the settled glass holds its spot on
    # the curved bowl floor instead of creeping (--no-stick for the legacy
    # viscous behavior)
    cfg.RIGID.body_contact_stick = 0.0 if _NO_STICK else 0.9
    # drop straight down: start the glass centered above the bowl interior
    # (the pour scene's floating bowl starts at (0.34, 0.127, 0.5); rim top
    # y~0.194, interior floor y~0.065; glass bottom is -0.235 body-frame
    # -> rest pose y~0.30)
    init = list(cfg.RIGID.init_state)
    init[3], init[4], init[5] = 0.34, 0.38, 0.5
    cfg.RIGID.init_state = tuple(init)
    cfg.freeze()
    base = np.load(ROOT / "envs/pour/pour_mpm_init_state_corotated.npy")
    rng = np.random.RandomState(0)
    pick = rng.choice(base.shape[0], 2000, replace=False)
    # park the particles away from the action so the clink is unobstructed
    pts = base[pick, :3] * 0.3 + np.array([0.15, 0.0, 0.15])
    env = SoftMacEnv(cfg, init_particles=pts, loss=False)
    env.reset()
    return env


def run(env, steps):
    """Roll the env forward; afterwards compute, in ONE jitted vmapped
    call, the per-step deepest glass-bowl interpenetration (per-step
    unjitted SDF probes would pay the tunnel's ~29 ms RPC per op)."""
    import jax
    import jax.numpy as jnp

    from softmac_tpu.engine import quat as Q
    from softmac_tpu.engine.rigid import RigidState
    from softmac_tpu.engine.sdf import sample_sdf_world

    qs = []
    for _ in range(steps):
        env.step(np.zeros(env.action_dim))
        qs.append(np.asarray(env._carry[2].q))
    qs = np.asarray(qs)

    m = env.rigid_model

    def depth_at(prims, q):
        bs = m.body_states(RigidState(q=q, qd=jnp.zeros_like(q)))
        worst = jnp.inf
        for a, b in ((0, 1), (1, 0)):
            pts = jnp.asarray(m.bodies[a].contact_points, q.dtype)
            p_w = (Q.qrot(jnp.broadcast_to(bs.quat[a], (pts.shape[0], 4)),
                          pts) + bs.pos[a])
            sdf = sample_sdf_world(
                prims[b],
                (bs.pos[b][0], bs.pos[b][1], bs.pos[b][2]),
                (bs.quat[b][0], bs.quat[b][1], bs.quat[b][2], bs.quat[b][3]),
                (p_w[:, 0], p_w[:, 1], p_w[:, 2]))
            worst = jnp.minimum(worst, sdf.min())
        return worst

    depths = jax.jit(jax.vmap(depth_at, in_axes=(None, 0)))(
        env.prims, jnp.asarray(qs, env.dtype))
    return qs, np.asarray(depths)


def main():
    global _NO_STICK
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--render", action="store_true")
    ap.add_argument("--no-stick", action="store_true",
                    help="legacy viscous friction (pre-round-5 behavior)")
    args = ap.parse_args()
    _NO_STICK = args.no_stick

    log_dir = ROOT / "logs/body_contact"
    log_dir.mkdir(parents=True, exist_ok=True)

    env_off = build_env(body_contact=False)
    traj_off, depth_off = run(env_off, args.steps)
    del env_off

    env = build_env(body_contact=True)
    traj_on, depth_on = run(env, args.steps)
    np.save(log_dir / "trajectory.npy",
            {"on": traj_on, "off": traj_off,
             "depth_on": depth_on, "depth_off": depth_off})

    # Two discriminators (both bodies are thin shells, so even a full
    # pass-through only reads ~wall-thickness on the mutual SDF):
    # 1. interpenetration: OFF reaches wall-thickness overlap (~5 mm =
    #    the glass passes bodily through the bowl shell); ON stays at
    #    penalty scale (~1 mm).
    # 2. force transmission: the floating bowl is pushed down by the clink
    #    when contact is ON, and never moves when OFF.
    bowl_drop_on = traj_on[0, 10] - traj_on[:, 10].min()
    bowl_drop_off = traj_off[0, 10] - traj_off[:, 10].min()
    print(f"glass y: start {traj_on[0, 4]:.3f}, "
          f"final ON {traj_on[-1, 4]:.3f} / OFF {traj_off[-1, 4]:.3f}")
    print(f"deepest glass-bowl overlap: OFF {depth_off.min():.4f} m "
          f"(pass-through at wall thickness), ON {depth_on.min():.4f} m "
          "(penalty-bounded)")
    print(f"bowl pushed down: ON {bowl_drop_on:.4f} m (clink transmitted), "
          f"OFF {bowl_drop_off:.6f} m (no interaction)")
    assert depth_off.min() < -0.003, "scene never overlapped — geometry off"
    assert depth_on.min() > -0.003 and depth_on.min() > depth_off.min(), \
        f"body_contact failed to bound interpenetration: {depth_on.min()}"
    assert bowl_drop_off < 1e-4, bowl_drop_off
    assert bowl_drop_on > 0.01, bowl_drop_on

    if args.render:
        # render from the ON env's recorded history (the software
        # rasterizer takes seconds/frame on this 1-core host — keep the
        # frame count low)
        from softmac_tpu.utils import make_gif_from_numpy
        frames = range(0, args.steps + 1, max(args.steps // 20, 1))
        images = [env.render(f * env.substeps) for f in frames]
        make_gif_from_numpy(images, str(log_dir), "body_contact")
        print(f"wrote {log_dir}/body_contact.gif")


if __name__ == "__main__":
    main()
