"""Coupled-scene oracle parity: the FULL pour env step (mixed contact +
floating rigid dynamics, reference `softmac/engine/mpm_simulator.py:396-443`
+ `rigid_simulator.py` free bodies) against the independent NumPy f64
oracle in tests/oracle.py.

This is the CPU-f64 twin of bench.py's on-hardware `tpu_oracle_check`
coupled gate: the same oracle loop, here at 1e-8 tolerance.
"""
import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from oracle import (
    OraclePrim, oracle_body_state_floating, oracle_floating_step,
    oracle_substep_mixed,
)

ROOT = Path(__file__).resolve().parents[1]


def build_small_pour_env(n=400, window=()):
    """Small coupled pour scene. window=() -> full grid (dense path, the
    CPU-f64 oracle tests); bench.py passes the demo window so the TPU gate
    runs the production sorted-carry chunked kernels."""
    from softmac_tpu import SoftMacEnv, load

    cfg = load(str(ROOT / "softmac_tpu/config/demo_pour_config.py"))
    cfg.defrost()
    cfg.TPU.active_window = tuple(window)
    cfg.freeze()
    base = np.load(ROOT / "envs/pour/pour_mpm_init_state_corotated.npy")
    rng = np.random.RandomState(3)
    pick = rng.choice(base.shape[0], n, replace=False)
    pts = base[pick, :3] + np.array([0.0, 0.04, 0.0])
    env = SoftMacEnv(cfg, init_particles=pts)
    env.reset()
    return env


def oracle_prim_of(sdf_params):
    res = tuple(int(r) for r in sdf_params.res)
    sdf = np.asarray(sdf_params.table, np.float64).reshape(res)
    normal = np.asarray(sdf_params.normals, np.float64).T.reshape(res + (3,))
    return OraclePrim(sdf, normal,
                      np.asarray(sdf_params.lower, np.float64),
                      np.asarray(sdf_params.upper, np.float64),
                      float(sdf_params.inv_dx))


def run_oracle_env_steps(env, actions):
    """NumPy f64 replica of env._env_step_fn for the pour scene (all-floating
    rigid bodies, CONTACT_MIXED). Returns (x, v, q, qd) after the steps."""
    cfg = env.mpm_cfg
    rm = env.rigid_model
    carry = env._initial_carry()
    mpm0, _, rigid0 = carry

    x = np.asarray(mpm0.x, np.float64).T.copy()
    v = np.asarray(mpm0.v, np.float64).T.copy()
    C = np.moveaxis(np.asarray(mpm0.C, np.float64), -1, 0).copy()
    F = np.moveaxis(np.asarray(mpm0.F, np.float64), -1, 0).copy()
    q = np.asarray(rigid0.q, np.float64).copy()
    qd = np.asarray(rigid0.qd, np.float64).copy()

    prims = [oracle_prim_of(p) for p in env.prims]
    frictions = np.asarray(env.mpm_params.friction, np.float64)
    softnesses = np.asarray(env.mpm_params.softness, np.float64)
    mu = float(np.asarray(env.mpm_params.mu)[0])
    lam = float(np.asarray(env.mpm_params.lam)[0])
    gravity = np.asarray(env.mpm_params.gravity, np.float64)

    bodies = rm.bodies
    assert all(b.jtype == "floating" for b in bodies)
    grav_flags = np.array([1.0 if b.gravity_on else 0.0 for b in bodies])
    if rm.enable_floor:
        floors = [(b.support_points, rm.floor_height, rm.floor_stiffness,
                   rm.floor_damping) for b in bodies]
    p_rho = cfg.p_mass / cfg.p_vol

    for action in np.asarray(actions, np.float64):
        # body states are frozen across the step's substeps (env.py:403-414)
        bstates = [oracle_body_state_floating(
            q[b.q_offset:b.q_offset + 6], qd[b.q_offset:b.q_offset + 6],
            np.asarray(b.com, np.float64)) for b in bodies]
        wr_acc = np.zeros((len(bodies), 6))
        for k in range(cfg.substeps):
            life = 1.0 / (cfg.substeps - k)
            x, v, C, F, wr = oracle_substep_mixed(
                x, v, C, F, dt=cfg.dt, n_grid=cfg.n_grid, mu=mu, lam=lam,
                gravity=gravity, prims=prims, bodies=bstates,
                frictions=frictions, softnesses=softnesses, life=life,
                material_model=cfg.material_model, ptype=cfg.ptype,
                ground_friction=cfg.ground_friction,
                push_cap=cfg.contact_push_velocity_cap, p_rho=p_rho)
            wr_acc += wr
        ext_f = wr_acc / cfg.substeps
        if (grav_flags == 0).any():
            ext_f = ext_f * grav_flags[:, None]
        for i, b in enumerate(bodies):
            o = b.q_offset
            act6 = action[o:o + 6]
            fl = floors[i] if rm.enable_floor else None
            q6, qd6 = oracle_floating_step(
                q[o:o + 6], qd[o:o + 6], mass=b.mass, inertia=b.inertia,
                com=b.com, gravity=rm.gravity, action6=act6,
                ext_f6=ext_f[i], dt=rm.dt, gravity_on=b.gravity_on,
                floor=fl)
            q[o:o + 6], qd[o:o + 6] = q6, qd6
    return x, v, q, qd


def test_pour_env_step_matches_coupled_oracle():
    env = build_small_pour_env(n=400)
    n_steps = 3
    rng = np.random.RandomState(7)
    actions = rng.randn(n_steps, env.action_dim) * 0.05

    step = jax.jit(lambda c, a, prims, params: env._env_step_fn(
        c, a, params=params, prims=prims))
    carry = env._initial_carry()
    for t in range(n_steps):
        carry, _ = step(carry, actions[t].astype(env.dtype), env.prims,
                        env.mpm_params)
    mpm_f, _, rigid_f = jax.block_until_ready(carry)

    ox, ov, oq, oqd = run_oracle_env_steps(env, actions)

    x_j = np.asarray(mpm_f.x, np.float64).T
    v_j = np.asarray(mpm_f.v, np.float64).T
    assert np.abs(x_j - ox).max() < 1e-9, np.abs(x_j - ox).max()
    assert np.abs(v_j - ov).max() < 1e-7, np.abs(v_j - ov).max()
    assert np.abs(np.asarray(rigid_f.q, np.float64) - oq).max() < 1e-8
    assert np.abs(np.asarray(rigid_f.qd, np.float64) - oqd).max() < 1e-6

    # the contact actually engaged (otherwise this test proves nothing)
    assert np.abs(oqd).max() > 0.0


def test_contact_wrench_engages():
    """The small pour scene must exercise the mixed-contact path: at least
    one particle inside a primitive's contact threshold over the horizon."""
    env = build_small_pour_env(n=400)
    carry = env._initial_carry()
    mpm0, _, rigid0 = carry
    x = np.asarray(mpm0.x, np.float64).T
    prims = [oracle_prim_of(p) for p in env.prims]
    rm = env.rigid_model
    q = np.asarray(rigid0.q, np.float64)
    total = 0
    for b, prim in zip(rm.bodies, prims):
        o = b.q_offset
        pos, bq, _, _ = oracle_body_state_floating(
            q[o:o + 6], np.zeros(6), np.asarray(b.com, np.float64))
        from oracle import _qconj, _qnorm, _qrot, oracle_sdf_query
        p_loc = _qrot(_qnorm(_qconj(bq)), x - pos)
        dist, _, _ = oracle_sdf_query(prim, p_loc)
        total += int((dist <= 5e-3).sum())
    assert total > 0, "no particle in contact range; scene too sparse"
