from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]


def test_meshgen_disk_and_grid():
    from softmac_tpu.engine.meshgen import generate_disk, generate_grid
    v, f = generate_disk(n_rings=4, radius=1.0)
    assert v.shape[1] == 3 and f.shape[1] == 3
    assert np.abs(np.linalg.norm(v[:, [0, 2]], axis=1)).max() <= 1.0 + 1e-9
    # all faces reference valid vertices; surface is connected
    assert f.min() >= 0 and f.max() < len(v)
    # total disk area ~ pi r^2
    tri = v[f]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1).sum()
    assert abs(area - np.pi) < 0.2

    v2, f2 = generate_grid(nx=5, nz=4)
    assert len(v2) == 20 and len(f2) == 2 * 4 * 3


def test_mlp_policy_closed_loop():
    """Closed-loop policy rollout is trainable with simulation gradients —
    the capability the reference's dead MLP (soft_cloth/engine/nn/mlp.py)
    was meant to provide."""
    from softmac_tpu import SoftMacEnv, load
    from softmac_tpu.engine.policy import MLPPolicy, make_closed_loop_rollout

    cfg = load(str(ROOT / "softmac_tpu/config/demo_pour_vel_config.py"))
    env = SoftMacEnv(cfg)

    policy = MLPPolicy(hidden_dims=(32,), action_dim=env.action_dim,
                       action_scale=0.5)
    loss_fn, init_params = make_closed_loop_rollout(env, policy, n_steps=3,
                                                    n_observed=50)
    params = init_params(jax.random.PRNGKey(0))
    loss = loss_fn(params)
    assert np.isfinite(float(loss))

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(jnp.sum(jnp.abs(l))) for l in leaves) > 0
