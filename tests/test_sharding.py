"""Multi-chip correctness: the sharded rollout is the SAME code path as the
single-chip one (engine/mpm.py substep with axis_name psums), so an 8-device
particle-sharded rollout of the coupled pour scene must match the 1-device
rollout to float tolerance (f64 here: conftest forces CPU x64)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from softmac_tpu.parallel import sharding as sh


@pytest.fixture(scope="module")
def pour_env():
    return sh.build_small_pour_env(n_particles=256)


def _unsharded_rollout(env, carry0, actions):
    def step(c, a):
        c, _ = env._env_step_fn(c, a)
        return c, None
    final, _ = jax.lax.scan(step, carry0, actions)
    return final


def test_sharded_rollout_matches_single_device(pour_env):
    env = pour_env
    assert len(jax.devices()) >= 8, "conftest provisions 8 virtual CPU devices"
    n_steps = 3
    carry0 = env._initial_carry()
    # actions push the glass: exercises rigid dynamics + contact coupling
    actions = jnp.zeros((n_steps, env.action_dim), env.dtype)
    actions = actions.at[:, 3].set(2.0)  # world-x force on the glass

    ref = jax.jit(lambda c, a: _unsharded_rollout(env, c, a))(carry0, actions)

    mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
    rollout = sh.make_sharded_rollout(env, mesh, n_steps)
    out = rollout(env.mpm_params, carry0, actions, env.prims)

    # particle state
    np.testing.assert_allclose(np.asarray(out[0].x), np.asarray(ref[0].x),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out[0].v), np.asarray(ref[0].v),
                               rtol=1e-9, atol=1e-12)
    # rigid state moved (coupling is live) and matches
    assert float(jnp.abs(ref[2].qd).max()) > 0
    np.testing.assert_allclose(np.asarray(out[2].q), np.asarray(ref[2].q),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out[2].qd), np.asarray(ref[2].qd),
                               rtol=1e-9, atol=1e-12)
    # contact actually fired: particles near the glass picked up wrench
    assert np.isfinite(np.asarray(out[0].x)).all()


def test_sharded_train_step_descends(pour_env):
    env = pour_env
    dp, sp = 2, 4
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(dp, sp), ("dp", "sp"))
    carry0 = env._initial_carry()
    batched = jax.tree.map(
        lambda s: jnp.broadcast_to(s[None], (dp,) + s.shape), carry0)
    actions = jnp.zeros((dp, 2, env.action_dim), env.dtype)
    rng = np.random.RandomState(0)
    target = jnp.asarray(0.45 + 0.1 * rng.rand(64, 3), env.dtype)

    step = sh.make_sharded_train_step(env, mesh, lr=1e-3)
    loss0, actions1 = step(env.mpm_params, batched, actions, target,
                           env.prims)
    assert np.isfinite(float(loss0))
    assert not np.allclose(np.asarray(actions1), 0.0)  # gradients flowed


def test_sharded_sorted_carry_matches_default(pour_env, monkeypatch):
    """The sharded scan's per-shard sorted-carry (each shard sorts its local
    particles, runs assume_sorted, unsorts at exit) must match the default
    sharded rollout exactly — on CPU f64 the kernels stay off, isolating
    the local-permutation plumbing under shard_map."""
    from softmac_tpu.engine import mpm as mpm_mod

    env = pour_env
    n_steps = 3
    rng = np.random.RandomState(3)
    actions = jnp.asarray(rng.uniform(-0.5, 0.5, (n_steps, env.action_dim)))
    carry0 = env._initial_carry()

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("sp",))
    ref = sh.make_sharded_rollout(env, mesh, n_steps)(
        env.mpm_params, carry0, actions, env.prims)

    monkeypatch.setattr(mpm_mod, "sorted_transfers_wanted",
                        lambda cfg, dtype: True)
    got = sh.make_sharded_rollout(env, mesh, n_steps)(
        env.mpm_params, carry0, actions, env.prims)
    np.testing.assert_allclose(np.asarray(got[0].x), np.asarray(ref[0].x),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(got[2].q), np.asarray(ref[2].q),
                               atol=1e-12)


def test_sharded_rollout_articulated_tree(tmp_path):
    """The articulated-tree solver (engine/chain.py) under shard_map: an
    8-device particle-sharded rollout of a scene whose rigid primitive is a
    double pendulum INSIDE the particle blob must match the 1-device
    rollout (rigid state is replicated; only the transfers shard)."""
    import test_chain
    env = test_chain.build_chain_env(tmp_path, n_particles=256)
    # start the arm inside the blob with inward swing so contact fires
    # within a few steps
    env.rigid_model._q0 = np.asarray([0.42, 0.0])
    env.rigid_model._qd0 = np.asarray([-1.0, 0.0])

    n_steps = 3
    carry0 = env._initial_carry()
    actions = jnp.zeros((n_steps, env.action_dim), env.dtype)

    ref = jax.jit(lambda c, a: _unsharded_rollout(env, c, a))(carry0, actions)

    mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
    rollout = sh.make_sharded_rollout(env, mesh, n_steps)
    out = rollout(env.mpm_params, carry0, actions, env.prims)

    assert float(jnp.abs(ref[2].qd).max()) > 0.1  # the tree is swinging
    for c in range(3):
        np.testing.assert_allclose(np.asarray(out[0].x[c]),
                                   np.asarray(ref[0].x[c]),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(out[0].v[c]),
                                   np.asarray(ref[0].v[c]),
                                   rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out[2].q), np.asarray(ref[2].q),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out[2].qd), np.asarray(ref[2].qd),
                               rtol=1e-9, atol=1e-12)


@pytest.fixture(scope="module")
def hit_env():
    from softmac_tpu import SoftMacEnv, load
    cfg = load("softmac_tpu/config/demo_hit_config.py")
    env = SoftMacEnv(cfg)
    control_idx = np.full(env.n_particles, -1, np.int32)
    control_idx[:4000] = 0   # the chopstick cylinders (demo_hit setup)
    env.set_control_idx(control_idx)
    return env


def test_sharded_cloth_rollout_matches_single_device(hit_env):
    """Cloth-coupled env under shard_map: particles sharded over 8 devices
    (per-particle MPMParams local, contact_id/penetration side-state
    sharded), cloth vertex state replicated, per-particle vertex contact
    forces psum'd (mpm.substep_cloth axis_name) — must match the 1-device
    rollout exactly."""
    env = hit_env
    n_steps = 2
    carry0 = env._initial_carry()
    actions = jnp.zeros((n_steps, env.action_dim), env.dtype)
    actions = actions.at[:, 2].set(-8.0)

    ref = jax.jit(lambda c, a: _unsharded_rollout(env, c, a))(carry0, actions)

    mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
    rollout = sh.make_sharded_rollout(env, mesh, n_steps)
    out = rollout(env.mpm_params, carry0, actions, env.prims)

    np.testing.assert_allclose(np.asarray(out[0].x), np.asarray(ref[0].x),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out[0].v), np.asarray(ref[0].v),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out[1].x), np.asarray(ref[1].x),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out[1].v), np.asarray(ref[1].v),
                               rtol=1e-9, atol=1e-12)
    # contact ids come from a distance argmin: a particle whose nearest
    # cloth feature is a shared edge has tied distances, and the psum's
    # ulp-level reordering of x can break the tie differently — so require
    # agreement on all but a vanishing fraction instead of exact equality
    cid_o = np.asarray(out[2].contact_id)
    cid_r = np.asarray(ref[2].contact_id)
    agree = cid_o == cid_r
    assert agree.mean() > 0.999, f"{(~agree).sum()} contact ids differ"
    np.testing.assert_array_equal(np.asarray(out[2].penetration)[agree],
                                  np.asarray(ref[2].penetration)[agree])
    assert np.isfinite(np.asarray(out[0].x)).all()


def test_sharded_cloth_train_step_runs(hit_env):
    """Full dp x sp training step on the cloth-coupled scene: dp-batched
    trajectories x sp-sharded particles through the production cloth env
    step (substep_cloth psums + replicated PD cloth solve), chamfer loss,
    grad, update — finite loss, gradients reach the MPM control actions."""
    env = hit_env
    dp, sp = 2, 4
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(dp, sp), ("dp", "sp"))
    carry0 = env._initial_carry()
    batched = jax.tree.map(
        lambda s: jnp.broadcast_to(s[None], (dp,) + s.shape), carry0)
    actions = jnp.zeros((dp, 1, env.action_dim), env.dtype)
    rng = np.random.RandomState(0)
    target = jnp.asarray(0.45 + 0.1 * rng.rand(64, 3), env.dtype)

    step = sh.make_sharded_train_step(env, mesh, lr=1e-3)
    loss0, actions1 = step(env.mpm_params, batched, actions, target,
                           env.prims)
    assert np.isfinite(float(loss0))
    assert not np.allclose(np.asarray(actions1), 0.0)  # gradients flowed
