"""Closed-loop neural controllers (obs -> action) for the simulator.

The reference ships an intended-but-broken Taichi MLP policy
(``soft_cloth/engine/nn/mlp.py`` imports a nonexistent class and uses the
removed ``ti.complex_kernel`` — it cannot run; SURVEY §2.2 #23). This module
provides the working equivalent: a flax MLP driven by the same observation
layout (subsampled particle x/v, ``soft_cloth/engine/mpm_simulator.py:769-784``
+ body/cloth state), differentiable end-to-end through the rollout so the
policy can be trained with analytic simulation gradients.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def mpm_observation(mpm_state, n_observed: int = 200) -> jnp.ndarray:
    """Subsampled particle positions+velocities, (n_observed*6,)
    (parity with get_observation, mpm_simulator.py:769-784)."""
    n = mpm_state.x.shape[-1]
    step = max(n // n_observed, 1)
    idx = jnp.arange(n_observed) * step
    idx = jnp.clip(idx, 0, n - 1)
    x = mpm_state.x[:, idx].T     # (n_observed, 3)
    v = mpm_state.v[:, idx].T
    return jnp.concatenate([x, v], axis=1).reshape(-1)


def body_observation(bodies) -> jnp.ndarray:
    """Rigid body poses+velocities flattened (B*13,)."""
    return jnp.concatenate([
        bodies.pos.reshape(-1), bodies.quat.reshape(-1),
        bodies.v.reshape(-1), bodies.w.reshape(-1)])


def cloth_observation(cloth_state) -> jnp.ndarray:
    return jnp.concatenate([cloth_state.x.reshape(-1), cloth_state.v.reshape(-1)])


class MLPPolicy(nn.Module):
    """obs -> action MLP (tanh-squashed, scaled)."""
    hidden_dims: Sequence[int]
    action_dim: int
    action_scale: float = 1.0

    @nn.compact
    def __call__(self, obs):
        h = obs
        for d in self.hidden_dims:
            h = nn.relu(nn.Dense(d)(h))
        a = nn.Dense(self.action_dim)(h)
        return self.action_scale * jnp.tanh(a)


def make_closed_loop_rollout(env, policy: MLPPolicy, n_steps: int,
                             n_observed: int = 200):
    """Build a jitted (params -> loss) closed-loop rollout: at every env step
    the policy maps the current observation to the action. Trainable with
    jax.grad(loss_fn)(params) — the capability the reference's dead MLP was
    meant to provide."""
    from softmac_tpu.engine.losses import FrameSample

    def obs_fn(carry):
        if env.has_cloth:
            mpm, cloth, _ = carry
            return jnp.concatenate([
                mpm_observation(mpm, n_observed), cloth_observation(cloth)])
        mpm, bodies, _ = carry
        parts = [mpm_observation(mpm, n_observed)]
        if bodies.pos.shape[0] > 0:
            parts.append(body_observation(bodies))
        return jnp.concatenate(parts)

    def env_step_p(prims, mpm_params, c, a):
        return env._env_step_fn(c, a, params=mpm_params, prims=prims)

    env_step = jax.checkpoint(env_step_p)
    carry0 = env._initial_carry()  # host-built; close over it (not traceable)

    # prims / mpm params are traced jit arguments (see engine/env.py):
    # the SDF tables would otherwise be baked into the policy executable
    def loss_fn(params, prims, mpm_params):
        carry = carry0

        def step(c, _):
            action = policy.apply(params, obs_fn(c))
            c, _aux = env_step(prims, mpm_params, c, action)
            return c, None

        carry, _ = jax.lax.scan(step, carry, None, length=n_steps)
        if env.has_cloth:
            mpm, cloth, _ = carry
            sample = FrameSample(x=mpm.x_nd, bodies=None,
                                 cloth_x=cloth.x, cloth_v=cloth.v)
        else:
            mpm, bodies, _ = carry
            sample = FrameSample(x=mpm.x_nd, bodies=bodies)
        terms = env.loss.terms(sample)
        return sum(terms.values())

    def init_params(rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        return policy.init(rng, obs_fn(carry0))

    loss_jit = jax.jit(loss_fn)
    return (lambda params: loss_jit(params, env.prims, env.mpm_params),
            init_params)
