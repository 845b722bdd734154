"""Multi-chip execution: device-mesh sharding for the simulation core.

The reference is strictly single-GPU (SURVEY §2.4) — parity needs one chip.
This module is the scale-out story the TPU-native design enables:

- **sp (particle sharding)**: particles split across chips along the lane
  axis; each chip computes a partial P2G grid from its particle shard (the
  dense splat matmul contracts only local particles) and the grids are
  combined with one ``psum`` over ICI. Grid ops are replicated; G2P reads the
  replicated grid against local particles. Contact wrenches are partial sums
  -> ``psum``. This is the halo-free analogue of multi-GPU MPM domain
  decomposition, riding ICI collectives instead of NCCL.

- **dp (trajectory batching)**: independent rollouts (multi-start trajectory
  optimization / parameter-study batches) sharded across chips; gradients are
  averaged with ``psum`` over the dp axis.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from softmac_tpu.engine import mpm as mpm_mod
from softmac_tpu.engine.materials import lame_parameters
from softmac_tpu.engine.types import (
    BodyState, MPMConfig, MPMParams, MPMState, mpm_state_zero,
    MODEL_NEOHOOKEAN, MAT_ELASTIC, CONTACT_GRID,
)
from softmac_tpu.ops import m33


def psum_grid(grid, axis_name: str):
    return tuple(jax.lax.psum(g, axis_name) for g in grid)


def sharded_substep(cfg, params, prims, state, bodies, k, mpm_action,
                    axis_name: str):
    """One substep with particles sharded along `axis_name`.

    Identical math to mpm.substep, with a psum combining the partial P2G
    grids (and partial contact wrenches) across the particle shards.
    """
    x = (state.x[0], state.x[1], state.x[2])
    v = (state.v[0], state.v[1], state.v[2])
    C = tuple(tuple(state.C[i, j] for j in range(3)) for i in range(3))
    F = tuple(tuple(state.F[i, j] for j in range(3)) for i in range(3))

    F_tmp = m33.mmul(m33.madd_diag(m33.mscale(C, cfg.dt), 1.0), F)
    from softmac_tpu.engine.materials import compute_stress_and_F, needs_svd
    from softmac_tpu.engine.svd3 import svd3_soa
    if needs_svd(cfg):
        U, sig, V = svd3_soa(F_tmp)
    else:
        U = sig = V = None
    stress, F_new = compute_stress_and_F(
        cfg, F_tmp, U, sig, V, params.mu, params.lam, params.yield_stress)

    zero = jnp.zeros_like(x[0])
    impulse = (zero, zero, zero)
    if cfg.n_controllers > 0 and mpm_action is not None:
        cidx = params.control_idx
        sel = jnp.clip(cidx, 0, cfg.n_controllers - 1)
        on = cidx >= 0
        impulse = tuple(
            impulse[d] + jnp.where(on, 6e-4 * mpm_action[sel, d] * cfg.dt, 0.0)
            for d in range(3))

    W, WD = mpm_mod.axis_weights(cfg, x)
    Hyz, HyzDy, HyzDz = mpm_mod.hyz_family(cfg, W, WD)

    grid = mpm_mod.p2g_dense(cfg, W, WD, Hyz, HyzDy, HyzDz, v, C, stress, impulse)
    grid = psum_grid(grid, axis_name)  # combine partial grids over ICI

    coords = mpm_mod.grid_coords(cfg)
    g_v, mask, grid_m = mpm_mod.grid_normalize(cfg, grid, params.gravity)
    grid_v_out = mpm_mod.boundary_condition(cfg, coords, g_v)

    v_new, C_new, x_new = mpm_mod.g2p_dense(
        cfg, W, WD, Hyz, HyzDy, HyzDz, grid_v_out, x)

    return MPMState(
        x=jnp.stack(x_new), v=jnp.stack(v_new),
        C=m33.to_mat_array(C_new), F=m33.to_mat_array(F_new))


def build_demo_scene(n_particles=512, n_grid=32, substeps=2, dtype=jnp.float32,
                     seed=0):
    """Tiny controllable MPM scene used by the multi-chip dry run and tests."""
    cfg = MPMConfig(
        n_particles=n_particles, n_grid=n_grid, dt=2e-4, substeps=substeps,
        material_model=MODEL_NEOHOOKEAN, ptype=MAT_ELASTIC,
        collision_type=CONTACT_GRID, ground_friction=1.5, n_primitives=0,
        n_controllers=1, primitives_contact=(), enable_external_force=(),
        dtype=dtype,
    )
    mu, lam = lame_parameters(5e3, 0.2, MAT_ELASTIC)
    params = MPMParams(
        mu=jnp.full((n_particles,), mu, dtype),
        lam=jnp.full((n_particles,), lam, dtype),
        yield_stress=jnp.full((n_particles,), 50.0, dtype),
        gravity=jnp.asarray([0.0, -9.8, 0.0], dtype),
        control_idx=jnp.zeros((n_particles,), jnp.int32),
        friction=jnp.zeros((1,), dtype),
        softness=jnp.zeros((1,), dtype),
    )
    rng = np.random.RandomState(seed)
    x0 = 0.4 + 0.2 * rng.rand(n_particles, 3)
    state = mpm_state_zero(cfg, jnp.asarray(x0))
    target = jnp.asarray(0.45 + 0.1 * rng.rand(n_particles, 3), dtype)
    return cfg, params, state, target


def make_sharded_train_step(mesh: Mesh, cfg, params, target, n_steps: int,
                            lr: float = 1e-2):
    """A full jitted training step over the mesh: dp-batched trajectories x
    sp-sharded particles, value_and_grad through the rollout, SGD update.

    Returns (step_fn, shardings) where
    step_fn(actions (B, T, n_ctl, 3), mpm_state (B, 3dims.., N)) ->
    (loss, new_actions).
    """
    bodies = BodyState.identity(0, cfg.dtype)

    def rollout_local(actions, state):
        """Rollout on one dp shard with sp-sharded particles."""
        # per-particle parameter arrays sized to the local shard (values are
        # uniform, so rebuild locally instead of sharding them through specs)
        n_local = state.x.shape[-1]
        local_params = params.replace(
            mu=jnp.broadcast_to(params.mu[:1], (n_local,)),
            lam=jnp.broadcast_to(params.lam[:1], (n_local,)),
            yield_stress=jnp.broadcast_to(params.yield_stress[:1], (n_local,)),
            control_idx=jnp.broadcast_to(params.control_idx[:1], (n_local,)),
        )

        def env_step(carry, action):
            def sub(c, k):
                return sharded_substep(cfg, local_params, (), c, bodies, k,
                                       action, axis_name="sp"), None
            carry, _ = jax.lax.scan(sub, carry, jnp.arange(cfg.substeps))
            return carry, None

        final, _ = jax.lax.scan(jax.checkpoint(env_step), state, actions)
        # chamfer-to-target on the particle shard (psum over sp)
        diff = final.x.T[:, None, :] - target[None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        loss = jnp.sum(jnp.min(d2, axis=1))
        return jax.lax.psum(loss, "sp")

    def train_step(actions, state):
        def loss_fn(a):
            l = rollout_local(a[0], jax.tree.map(lambda s: s[0], state))
            return jax.lax.pmean(l, "dp")

        loss, g = jax.value_and_grad(loss_fn)(actions)
        g = jax.lax.pmean(g, "dp")
        return loss, actions - lr * g

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    state_spec = MPMState(
        x=P("dp", None, "sp"), v=P("dp", None, "sp"),
        C=P("dp", None, None, "sp"), F=P("dp", None, None, "sp"))
    kwargs = dict(mesh=mesh, in_specs=(P("dp"), state_spec),
                  out_specs=(P(), P("dp")))
    try:
        sharded = shard_map(train_step, check_vma=False, **kwargs)
    except TypeError:
        sharded = shard_map(train_step, check_rep=False, **kwargs)
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
    devices = jax.devices()
    if len(devices) >= n_devices:
        return devices[:n_devices]
    devices = jax.devices("cpu")
    if len(devices) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(jax.devices())} and could "
            f"only provision {len(devices)} virtual CPU devices; set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices} "
            f"JAX_PLATFORMS=cpu before process start")
    return devices[:n_devices]


def dryrun(n_devices: Optional[int] = None, n_steps: int = 2) -> None:
    """Create an n-device mesh, jit the full sharded training step, run one
    update on tiny shapes. Used by __graft_entry__.dryrun_multichip."""
    if n_devices is None:
        n_devices = len(jax.devices())
    devices = _provision_devices(n_devices)
    dp = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    sp = n_devices // dp
    mesh = Mesh(np.array(devices).reshape(dp, sp), ("dp", "sp"))

    n_particles = 64 * sp
    cfg, params, state, target = build_demo_scene(
        n_particles=n_particles, n_grid=32, substeps=2)

    # batch over dp
    batched_state = jax.tree.map(
        lambda s: jnp.broadcast_to(s[None], (dp,) + s.shape), state)
    actions = jnp.zeros((dp, n_steps, 1, 3), cfg.dtype)

    step = make_sharded_train_step(mesh, cfg, params, target, n_steps)
    loss, new_actions = step(actions, batched_state)
    loss = float(loss)
    assert np.isfinite(loss), "multichip dryrun produced non-finite loss"
    assert np.isfinite(np.asarray(new_actions)).all()
    print(f"[dryrun_multichip] mesh=({dp}x{sp}) devices={n_devices} "
          f"loss={loss:.6f} grad-updated actions OK")
