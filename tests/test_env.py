"""End-to-end environment tests on the real pour_vel scene (CPU, f64).

These exercise the full stack: config loading, URDF/SDF scene build, the
jitted coupled rollout, loss accumulation, and action gradients (checked
against central finite differences — the reference's validation gate is
per-step gradient fidelity, SURVEY §6)."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def pour_vel_env():
    from softmac_tpu import SoftMacEnv, load
    cfg = load(str(ROOT / "softmac_tpu/config/demo_pour_vel_config.py"))
    return SoftMacEnv(cfg)


def test_env_build(pour_vel_env):
    env = pour_vel_env
    assert env.n_particles == 5000
    assert env.n_primitives == 2
    assert env.action_dim == 12
    assert env.dtype == jnp.float64  # CPU x64 build


def test_rollout_matches_stepwise(pour_vel_env):
    """The fused rollout and the imperative facade must agree exactly."""
    env = pour_vel_env
    actions = np.zeros((4, 12))
    actions[:, 2] = 2.0

    out = env.rollout(actions, loss_start_frame=0, loss_stride=4)
    x_roll = np.asarray(out["carry"][0].x)

    env.reset()
    for a in actions:
        env.step(a)
    x_step = np.asarray(env._carry[0].x)
    np.testing.assert_allclose(x_step, x_roll, atol=1e-12)


def test_sorted_carry_rollout_matches_default(pour_vel_env, monkeypatch):
    """The sorted-carry rollout (env._build_rollout use_sort: sort at entry,
    re-key per block, params+perm riding the carry, unsort at exit) must be
    physics- and gradient-neutral. On CPU f64 the chunked kernels stay off,
    so this isolates the permutation plumbing itself."""
    from softmac_tpu.engine import mpm as mpm_mod
    from softmac_tpu import SoftMacEnv, load

    env = pour_vel_env
    actions = np.zeros((4, 12))
    actions[:, 2] = 2.0
    ref = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=2)

    cfg = load(str(ROOT / "softmac_tpu/config/demo_pour_vel_config.py"))
    env_s = SoftMacEnv(cfg)
    monkeypatch.setattr(mpm_mod, "sorted_transfers_wanted",
                        lambda cfg, dtype: True)
    out = env_s.rollout_and_grad(actions, loss_start_frame=0, loss_stride=2)

    np.testing.assert_allclose(float(out["loss"]), float(ref["loss"]),
                               rtol=1e-12)
    np.testing.assert_allclose(out["carry"][0].x, ref["carry"][0].x,
                               atol=1e-12)
    np.testing.assert_allclose(out["action_grad"], ref["action_grad"],
                               rtol=1e-9, atol=1e-12)

    # segmented (truncated-BPTT) path threads the extended carry too
    ref_b = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=2,
                                 bptt_window=2)
    out_b = env_s.rollout_and_grad(actions, loss_start_frame=0,
                                   loss_stride=2, bptt_window=2)
    np.testing.assert_allclose(float(out_b["loss"]), float(ref_b["loss"]),
                               rtol=1e-12)
    np.testing.assert_allclose(out_b["action_grad"], ref_b["action_grad"],
                               rtol=1e-9, atol=1e-12)

    # store-all residual tape over the sorted carry (use_sort +
    # remat="none" — the short-horizon TPU configuration)
    out_n = env_s.rollout_and_grad(actions, loss_start_frame=0,
                                   loss_stride=2, remat="none")
    np.testing.assert_allclose(float(out_n["loss"]), float(ref["loss"]),
                               rtol=1e-12)
    np.testing.assert_allclose(out_n["action_grad"], ref["action_grad"],
                               rtol=1e-9, atol=1e-12)


def test_action_gradient_matches_fd(pour_vel_env):
    """jax.grad through the coupled rollout vs central differences."""
    env = pour_vel_env
    actions = np.zeros((4, 12))
    actions[:, 2] = 1.0

    out = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=4)
    g = np.asarray(out["action_grad"])
    assert np.isfinite(g).all()

    def loss_at(a):
        return float(env.rollout(a, loss_start_frame=0, loss_stride=4)["loss"])

    eps = 1e-5
    checked = 0
    for (t, d) in [(0, 2), (1, 3), (2, 4), (0, 4)]:
        ap = actions.copy(); ap[t, d] += eps
        am = actions.copy(); am[t, d] -= eps
        fd = (loss_at(ap) - loss_at(am)) / (2 * eps)
        if abs(fd) > 1e-8:
            np.testing.assert_allclose(g[t, d], fd, rtol=2e-3, atol=1e-9)
            checked += 1
    assert checked >= 2, "finite-difference probes were all zero"


def test_observation_and_state_io(pour_vel_env):
    env = pour_vel_env
    env.reset()
    obs = env.get_observation()
    assert obs.shape == (200 * 6 + 2 * 13,)

    packed = env.get_state()
    assert packed.shape == (5000, 24)
    env.step(np.zeros(12))
    env.set_state(packed)
    np.testing.assert_allclose(env.get_state(), packed, atol=1e-12)


def test_graft_entry_points():
    import sys
    sys.path.insert(0, str(ROOT))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)

    ge.dryrun_multichip(8)


def test_remat_none_matches_step(pour_vel_env):
    """remat="none" (reference-style store-all tape: scan keeps the
    custom_vjp residuals, no per-step checkpoint replay) must produce the
    same loss AND the same gradient as the default per-step remat —
    identical math, different residual policy."""
    env = pour_vel_env
    actions = np.zeros((4, 12))
    actions[:, 2] = 1.5
    ref = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=2)
    tape = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=2,
                                remat="none")
    np.testing.assert_allclose(float(tape["loss"]), float(ref["loss"]),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(tape["action_grad"]),
                               np.asarray(ref["action_grad"]),
                               rtol=1e-9, atol=1e-12)


def test_remat_window_matches_step(pour_vel_env):
    """remat="window:K" (checkpoint every K env steps, store-all within a
    window — the O(T/K)+O(K) middle point) must match the per-step policy
    bit-for-bit in loss and to roundoff in gradient, including when K does
    not divide the loss block (largest-divisor fallback)."""
    env = pour_vel_env
    actions = np.zeros((4, 12))
    actions[:, 2] = 1.5
    ref = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=2)
    for k in (2, 3):   # K=3 > block of 2 -> clamps to k=2
        win = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=2,
                                   remat=f"window:{k}")
        np.testing.assert_allclose(float(win["loss"]), float(ref["loss"]),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(win["action_grad"]),
                                   np.asarray(ref["action_grad"]),
                                   rtol=1e-9, atol=1e-12)
    # genuine non-divisor fallback: block=4 (stride 4, substeps 1), K=3 does
    # not divide 4 -> largest-divisor loop lands on k=2
    ref4 = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=4)
    win4 = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=4,
                                remat="window:3")
    np.testing.assert_allclose(float(win4["loss"]), float(ref4["loss"]),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(win4["action_grad"]),
                               np.asarray(ref4["action_grad"]),
                               rtol=1e-9, atol=1e-12)


def test_remat_window_multisubstep_env():
    """The window:K scan restructure must also hold on a multi-substep env
    (grip: substeps=5 — the per-step aux outputs carry an extra leading
    axis through the window reshape)."""
    from softmac_tpu import SoftMacEnv, load
    cfg = load(str(ROOT / "softmac_tpu/config/demo_grip_config.py"))
    base = np.load(ROOT / "envs/grip/grip_mpm_init_state.npy")
    rng = np.random.RandomState(5)
    pick = rng.choice(base.shape[0], 200, replace=False)
    env = SoftMacEnv(cfg, init_particles=base[pick, :3])
    actions = np.zeros((4, env.action_dim))
    actions[:, 0] = 0.3
    actions[:, 1] = -0.3
    ref = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=10)
    win = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=10,
                               remat="window:2")
    np.testing.assert_allclose(float(win["loss"]), float(ref["loss"]),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(win["action_grad"]),
                               np.asarray(ref["action_grad"]),
                               rtol=1e-9, atol=1e-12)


def test_auto_chunk_tile_resolution(monkeypatch):
    """VERDICT r3 #5: the chunked-kernel tile is picked per scene (no
    hand-carried env vars): auto rule (>=20k particles -> 2048, below ->
    the demo-validated 1536), cfg.TPU.tile_c overrides auto, env
    SOFTMAC_TPU_TILE_C overrides everything."""
    from softmac_tpu import SoftMacEnv, load
    from softmac_tpu.engine.mpm import auto_chunk_tile

    assert auto_chunk_tile(100_000) == 2048
    assert auto_chunk_tile(5_000) == 1536

    cfg = load(str(ROOT / "softmac_tpu/config/demo_pour_vel_config.py"))
    cfg.defrost(); cfg.TPU.active_window = (48, 32, 16); cfg.freeze()
    monkeypatch.delenv("SOFTMAC_TPU_TILE_C", raising=False)
    env = SoftMacEnv(cfg, loss=False)
    assert env.mpm_cfg.chunk_tile == 1536          # 5000 particles -> auto

    cfg2 = cfg.clone()
    cfg2.defrost(); cfg2.TPU.tile_c = 1024; cfg2.freeze()
    env2 = SoftMacEnv(cfg2, loss=False)
    assert env2.mpm_cfg.chunk_tile == 1024         # explicit config wins

    monkeypatch.setenv("SOFTMAC_TPU_TILE_C", "512")
    env3 = SoftMacEnv(cfg2, loss=False)
    assert env3.mpm_cfg.chunk_tile == 512          # env var wins over all


def test_window_init_extent_warning():
    """A window too small for even the initial blob warns at construction
    (the runtime overflow flag only fires after mass is already lost)."""
    import warnings

    from softmac_tpu import SoftMacEnv, load
    cfg = load(str(ROOT / "softmac_tpu/config/demo_pour_vel_config.py"))
    cfg.defrost(); cfg.TPU.active_window = (8, 8, 8); cfg.freeze()
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        SoftMacEnv(cfg, loss=False)
    assert any("cannot cover the initial particle extent" in str(w.message)
               for w in rec)

    # the real config's window must NOT warn
    cfg2 = load(str(ROOT / "softmac_tpu/config/demo_pour_vel_config.py"))
    with warnings.catch_warnings(record=True) as rec2:
        warnings.simplefilter("always")
        SoftMacEnv(cfg2, loss=False)
    assert not any("cannot cover" in str(w.message) for w in rec2)


def _small_grip_env():
    from softmac_tpu import SoftMacEnv, load
    cfg = load(str(ROOT / "softmac_tpu/config/demo_grip_config.py"))
    base = np.load(ROOT / "envs/grip/grip_mpm_init_state.npy")
    rng = np.random.RandomState(5)
    pick = rng.choice(base.shape[0], 200, replace=False)
    return SoftMacEnv(cfg, init_particles=base[pick, :3])


def test_arbitrary_loss_stride_matches_stepwise():
    """ANY ``range(start, T+1, stride)`` loss sampling must work — the
    reference samples its store-all tape at arbitrary frames
    (demo_pour.py:172-173). stride=7 on the grip env (substeps=5) cannot
    land on block boundaries, so the rollout takes the general per-substep
    weighted path (_sample_mask sub_weights); the oracle here replays the
    same physics stepwise in eager mode and evaluates the loss exactly at
    frames {0, 7, 14, 20}."""
    from softmac_tpu.engine import mpm as mpm_mod
    from softmac_tpu.engine.losses import FrameSample
    from softmac_tpu.engine.rigid import grad_scale

    env = _small_grip_env()
    n_steps, substeps = 4, env.substeps
    assert substeps == 5
    actions = np.zeros((n_steps, env.action_dim))
    actions[:, 0] = 0.3
    actions[:, 1] = -0.3

    # the general path must engage for stride 7
    block, n_blocks, _, include_f0, sub_w = env._sample_mask(n_steps, 0, 7)
    assert sub_w is not None and block == 1 and include_f0

    out = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=7)

    # --- stepwise oracle: same physics functions, independent (eager,
    # python-loop) orchestration + frame-exact loss sampling -------------
    wanted = set(range(0, n_steps * substeps + 1, 7))
    cfg, params, prims = env.mpm_cfg, env.mpm_params, env.prims
    mpm, bodies, rigid = env._initial_carry()
    expect = {}

    def add_terms(sample):
        for k, v in env.loss.terms(sample).items():
            expect[k] = expect.get(k, 0.0) + float(v)

    add_terms(FrameSample(x=mpm.x_nd, bodies=bodies))        # frame 0
    for t in range(n_steps):
        bodies_c = grad_scale(bodies, env.ext_grad_scale)
        extfs = []
        for k in range(substeps):
            mpm, extf, _ = mpm_mod.substep(
                cfg, params, prims, mpm, bodies_c, k, None)
            extfs.append(extf)
            if (t * substeps + k + 1) in wanted and k < substeps - 1:
                # mid-window frame: the window's forecast body state
                add_terms(FrameSample(x=mpm.x_nd, bodies=bodies_c))
        ext_f = sum(extfs) / substeps
        rigid = env.rigid_model.step(
            rigid, jnp.asarray(actions[t], env.dtype), ext_f, prims=prims)
        bodies = env.rigid_model.body_states(rigid)
        if (t + 1) * substeps in wanted:
            # window-boundary frame: the post-step body state
            add_terms(FrameSample(x=mpm.x_nd, bodies=bodies))

    for k, v in expect.items():
        np.testing.assert_allclose(float(out["terms"][k]), v, rtol=1e-9,
                                   err_msg=k)
    np.testing.assert_allclose(float(out["loss"]), sum(expect.values()),
                               rtol=1e-9)
    # (this short grip horizon never reaches contact, so the action
    # gradient is legitimately zero — just require finiteness here; nonzero
    # gradient flow through the general path is covered by
    # test_general_stride_matches_fast_path)
    assert np.isfinite(np.asarray(out["action_grad"])).all()


def test_general_stride_matches_fast_path(pour_vel_env):
    """Where a stride IS expressible at block boundaries, the general
    per-substep path must produce the identical loss and gradient — run
    stride 3 on the 1-substep pour_vel env twice: naturally (block=3,
    boundary-mask fast path) and with the general path forced."""
    env = pour_vel_env
    actions = np.zeros((6, 12))
    actions[:, 2] = 1.5
    ref = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=3)

    orig = env._sample_mask

    def forced(n_steps, start, stride):
        block, n_blocks, mask, inc_f0, sub_w = orig(n_steps, start, stride)
        if sub_w is None:
            total = n_steps * env.substeps
            s0 = 0 if start is None else int(start)
            wanted = set(range(s0, total + 1, int(stride)))
            sub_w = np.zeros((n_steps, env.substeps))
            bmask = np.zeros((n_steps,))
            for f in sorted(wanted - {0}):
                t, k = divmod(f - 1, env.substeps)
                if k == env.substeps - 1:
                    bmask[t] = 1.0        # boundary frames: post-step sample
                else:
                    sub_w[t, k] = 1.0
            return 1, n_steps, bmask, inc_f0, sub_w
        return block, n_blocks, mask, inc_f0, sub_w

    env._sample_mask = forced
    env._jit_cache.clear()
    try:
        gen = env.rollout_and_grad(actions, loss_start_frame=0,
                                   loss_stride=3)
    finally:
        env._sample_mask = orig
        env._jit_cache.clear()

    np.testing.assert_allclose(float(gen["loss"]), float(ref["loss"]),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gen["action_grad"]),
                               np.asarray(ref["action_grad"]),
                               rtol=1e-8, atol=1e-12)


def test_bptt_window_rollout(pour_vel_env):
    """Truncated-BPTT rollout: same forward values, finite gradients."""
    env = pour_vel_env
    actions = np.zeros((8, 12))
    actions[:, 2] = 1.0
    full = env.rollout(actions, loss_start_frame=0, loss_stride=4)
    trunc = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=4,
                                 bptt_window=4)
    np.testing.assert_allclose(float(trunc["loss"]), float(full["loss"]),
                               rtol=1e-12)
    g = np.asarray(trunc["action_grad"])
    assert np.isfinite(g).all()
    # late actions still get gradient within their segment
    assert np.abs(g[-4:]).sum() > 0


def test_batched_multistart_optimization(pour_vel_env):
    """B=4 trajectories in ONE jitted vmap program (multi-start trajectory
    optimization, SURVEY 2.4 'batched rollouts map to vmap+DP'): per-start
    losses match the unbatched rollout, grads are per-start, and one SGD
    step descends every start. (Single heavy compile — the batched grad
    program — shared by all three checks.)"""
    env = pour_vel_env
    rng = np.random.RandomState(0)
    T = 6
    acts = np.asarray(rng.uniform(-0.05, 0.05, (4, T, env.action_dim)))
    out = env.batched_rollout_and_grad(acts, loss_stride=2)
    g = np.asarray(out["action_grad"])
    loss0 = np.asarray(out["loss"])
    assert loss0.shape == (4,) and g.shape == acts.shape
    assert np.isfinite(g).all()

    # batched == unbatched, per start
    for i in range(2):
        out_i = env.rollout(acts[i], loss_stride=2)
        np.testing.assert_allclose(loss0[i], float(out_i["loss"]), rtol=1e-12)

    # one joint SGD step descends every start (reuses the same compile)
    out2 = env.batched_rollout_and_grad(acts - 2e-2 * g, loss_stride=2)
    loss1 = np.asarray(out2["loss"])
    assert (loss1 < loss0).all(), (loss0, loss1)


def test_jittered_replica_rollout(pour_vel_env):
    """env.jittered_carry: replica 0 exact, others perturbed; the mean-loss
    robustification harness (demo_door --replicas) rolls out all replicas
    in one batched program with finite per-replica losses, and replica 0
    reproduces the unbatched rollout exactly."""
    env = pour_vel_env
    K, T = 3, 4
    carryK = env.jittered_carry(K, sigma=1e-4, seed=5)
    x = np.asarray(carryK[0].x)
    base = np.asarray(env._initial_carry()[0].x)
    np.testing.assert_array_equal(x[0], base)
    assert (np.abs(x[1] - base).max() > 0) and (np.abs(x[2] - base).max() > 0)
    assert not np.array_equal(x[1], x[2])

    acts = np.zeros((K, T, env.action_dim))
    acts[:, :, 2] = 2.0
    out = env.batched_rollout(acts, carry0=carryK, loss_stride=2)
    losses = np.asarray(out["loss"])
    assert losses.shape == (K,) and np.isfinite(losses).all()

    ref = env.rollout(acts[0], loss_stride=2)
    np.testing.assert_allclose(losses[0], float(ref["loss"]), rtol=1e-12)


def test_candidate_by_replica_tiling(pour_vel_env):
    """The demo_door line-search tiling (C candidates x K replicas in one
    batched program: actions repeated per candidate, the jittered carry
    concatenated C times) must reproduce the per-pair unbatched losses."""
    env = pour_vel_env
    C, K, T = 2, 2, 4
    carryK = env.jittered_carry(K, sigma=1e-4, seed=6)
    rng = np.random.RandomState(7)
    cands = rng.uniform(-0.05, 0.05, (C, T, env.action_dim))

    tiled = np.repeat(cands, K, axis=0)
    carry_t = jax.tree.map(lambda s: jnp.concatenate([s] * C, axis=0),
                           carryK)
    out = env.batched_rollout(tiled, carry0=carry_t, loss_stride=2)
    losses = np.asarray(out["loss"]).reshape(C, K)

    for c in range(C):
        for k in range(K):
            single = jax.tree.map(lambda s: s[k:k + 1], carryK)
            ref = env.batched_rollout(cands[c][None], carry0=single,
                                      loss_stride=2)
            np.testing.assert_allclose(
                losses[c, k], float(np.asarray(ref["loss"])[0]), rtol=1e-12)


def test_controller_snapshot_restore():
    """Controller.snapshot/restore (demo_pour --safeguard) must make the
    optimizer path reproducible: restore + identical step == no detour."""
    from softmac_tpu.utils import Controller
    rng = np.random.RandomState(0)
    g1 = rng.randn(20, 3)
    g2 = rng.randn(20, 3)

    c = Controller(num_actions=4, action_dim=3, steps=20, lr=1e-2,
                   warmup=2, decay=0.9)
    c.step(g1)
    snap = c.snapshot()
    ref = Controller(num_actions=4, action_dim=3, steps=20, lr=1e-2,
                     warmup=2, decay=0.9)
    ref.step(g1)
    ref.step(g2)
    expect = ref.action.copy()

    c.step(rng.randn(20, 3))   # a detour step...
    c.restore(snap)            # ...rolled back
    c.step(g2)
    np.testing.assert_allclose(c.action, expect, atol=1e-15)

    # lr is part of the snapshot (safeguard halves it after restore)
    c.restore(snap)
    assert c.lr == 1e-2


def test_controller_disk_roundtrip(tmp_path):
    """Controller.save/load: resuming from disk continues the optimizer
    path exactly (actions, Adam moments, schedule position)."""
    from softmac_tpu.utils import Controller
    rng = np.random.RandomState(1)
    g1, g2 = rng.randn(20, 3), rng.randn(20, 3)

    c = Controller(num_actions=4, action_dim=3, steps=20, lr=1e-2,
                   warmup=2, decay=0.9)
    c.step(g1)
    c.save(tmp_path / "ctl.npy")

    ref = Controller(num_actions=4, action_dim=3, steps=20, lr=1e-2,
                     warmup=2, decay=0.9)
    ref.step(g1)
    ref.step(g2)

    c2 = Controller(num_actions=4, action_dim=3, steps=20, lr=1e-2,
                    warmup=2, decay=0.9)
    c2.load(tmp_path / "ctl.npy")
    c2.step(g2)
    np.testing.assert_allclose(c2.action, ref.action, atol=1e-15)
    assert c2.epoch == 2

    # extension-less round trip: np.save appends ".npy"; load mirrors it
    c.save(tmp_path / "ctl2")
    c3 = Controller(num_actions=4, action_dim=3, steps=20, lr=1e-2,
                    warmup=2, decay=0.9)
    c3.load(tmp_path / "ctl2")
    np.testing.assert_allclose(c3.action, c.action, atol=1e-15)
