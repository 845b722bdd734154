"""CPU twin of bench.py's cloth oracle gate: the engine's cloth-coupled
substep (mpm.substep_cloth: sticky forecast contact + barycentric vertex
force splat + penetration tracing, reference
soft_cloth/engine/mpm_simulator.py:418-518 and primitive_cloth.py:234-280)
vs the independent NumPy f64 cloth oracle (tests/oracle.py), on a small
scene with a FIXED cloth sheet. bench.py runs the same scene on hardware
through the sorted-carry chunked kernels (cloth_oracle_check)."""
import jax
import jax.numpy as jnp
import numpy as np

from softmac_tpu.engine import mpm
from softmac_tpu.engine.cloth_contact import (
    ClothContactParams, PenetrationState, get_contact_pair, process_faces,
    trace_penetration_after_mpm,
)
from softmac_tpu.engine.materials import lame_parameters
from softmac_tpu.engine.meshgen import generate_grid
from softmac_tpu.engine.types import (
    CONTACT_MIXED, MAT_PLASTIC, MODEL_COROTATED, MPMConfig, MPMParams,
    mpm_state_zero,
)

from oracle import (
    oracle_cloth_pair, oracle_cloth_trace_after_mpm,
    oracle_substep_cloth_mixed,
)


def build_cloth_scene(n=512, dtype=np.float32, window=None, seed=3):
    """Particle blob falling onto a pinned horizontal cloth sheet
    (sticky taco-style contact). Returns (cfg, params, cparams, state0,
    cloth_x, cloth_v, faces, neighbors, dirs, x0)."""
    n_grid = 32
    cfg = MPMConfig(
        n_particles=n, n_grid=n_grid, dt=2e-4, substeps=10,
        material_model=MODEL_COROTATED, ptype=MAT_PLASTIC,
        collision_type=CONTACT_MIXED, ground_friction=1.5,
        n_primitives=0, n_controllers=0, primitives_contact=(),
        enable_external_force=(), active_window=window,
        dtype=jnp.dtype(dtype))
    mu, lam = lame_parameters(5e3, 0.2, MAT_PLASTIC)
    params = MPMParams(
        mu=jnp.full((n,), mu, dtype), lam=jnp.full((n,), lam, dtype),
        yield_stress=jnp.full((n,), 60.0, dtype),
        gravity=jnp.asarray([0.0, -5.0, 0.0], dtype),
        control_idx=jnp.full((n,), -1, jnp.int32),
        friction=jnp.zeros((1,), dtype), softness=jnp.zeros((1,), dtype))

    # horizontal cloth sheet just under the blob (x-z plane at y=0.5)
    verts, faces = generate_grid(nx=9, nz=9, width=0.36, height=0.36)
    verts = verts[:, [0, 2, 1]]
    verts = verts + np.array([0.5 - 0.18, 0.5, 0.5 - 0.18])
    nb, nd = process_faces(faces, n_neighbors=60)
    cparams = ClothContactParams(
        faces=jnp.asarray(faces, jnp.int32),
        neighbor_faces=jnp.asarray(nb, jnp.int32),
        neighbor_dirs=jnp.asarray(nd, jnp.int8),
        friction=jnp.asarray(1.0, dtype), softness=jnp.asarray(666.0, dtype),
        cloth_force_scale=jnp.asarray(1.0, dtype),
        mpm_force_scale=jnp.asarray(1.0, dtype),
        sticky=True, mpm_scale=1.0, push_velocity_cap=5.0)

    rng = np.random.RandomState(seed)
    x0 = np.empty((n, 3))
    x0[:, 0] = 0.4 + 0.2 * rng.rand(n)
    x0[:, 1] = 0.501 + 0.03 * rng.rand(n)   # bottom slice in contact range
    x0[:, 2] = 0.4 + 0.2 * rng.rand(n)
    state0 = mpm_state_zero(cfg, jnp.asarray(x0, dtype))
    state0 = state0.replace(v=state0.v.at[1].set(-1.0))  # falling

    cloth_v = np.zeros_like(verts)
    cloth_v[:, 0] = 0.05  # small lateral motion so cv != 0 paths engage
    return (cfg, params, cparams, state0, verts, cloth_v, faces, nb, nd, x0)


def run_engine_cloth_substeps(cfg, params, cparams, state0, cloth_x, cloth_v,
                              n_sub=10, sorted_carry=False):
    """Scan n_sub substep_cloth calls with the contact-pair/penetration
    interleave of env._env_step_cloth (fixed cloth). With sorted_carry,
    re-sorts every substep and runs assume_sorted=True (the chunked-kernel
    contract), permuting the penetration side-state along — the on-hardware
    configuration bench.py gates."""
    dtype = state0.x.dtype
    cx = jnp.asarray(cloth_x, dtype)
    cv = jnp.asarray(cloth_v, dtype)
    n = state0.x.shape[1]
    x0v = (state0.x[0], state0.x[1], state0.x[2])
    pen0 = jnp.zeros((n,), jnp.int8)
    cid0 = get_contact_pair(cparams, cx, x0v, pen0)
    pen_state = PenetrationState(contact_id=cid0, penetration=pen0)

    @jax.jit
    def run(s, pen_state):
        def body(carry, k):
            s, pen_s, ids = carry
            if sorted_carry:
                perm, _ = mpm.sort_perm(cfg, s.x)
                s = mpm.permute_state(s, perm)
                pen_s = pen_s.replace(
                    contact_id=pen_s.contact_id[perm],
                    penetration=pen_s.penetration[perm])
                ids = ids[perm]
            x_prev = (s.x[0], s.x[1], s.x[2])
            s, extv, _ = mpm.substep_cloth(
                cfg, params, cparams, s, cx, cv, pen_s, k,
                assume_sorted=sorted_carry)
            x_new = (s.x[0], s.x[1], s.x[2])
            cid = get_contact_pair(cparams, cx, x_new, pen_s.penetration)
            pen_s = trace_penetration_after_mpm(
                cparams, cx, x_new, x_prev, pen_s, cid)
            return (s, pen_s, ids), extv
        (s, pen_s, ids), extv = jax.lax.scan(
            body, (s, pen_state, jnp.arange(n)), jnp.arange(n_sub))
        inv = jnp.argsort(ids)
        s = mpm.permute_state(s, inv)
        pen_s = pen_s.replace(contact_id=pen_s.contact_id[inv],
                              penetration=pen_s.penetration[inv])
        return s, pen_s, jnp.sum(extv, axis=0)

    return jax.block_until_ready(run(state0, pen_state))


def run_oracle_cloth_substeps(cfg, x0, cloth_x, cloth_v, faces, nb, nd,
                              mu, lam, n_sub=10):
    n = x0.shape[0]
    x = x0.copy()
    v = np.zeros((n, 3)); v[:, 1] = -1.0
    C = np.zeros((n, 3, 3))
    F = np.tile(np.eye(3), (n, 1, 1))
    pen = np.zeros((n,), np.int8)
    cid = oracle_cloth_pair(faces, cloth_x, x, pen)
    ext_sum = np.zeros((cloth_x.shape[0], 3))
    for k in range(n_sub):
        x_prev = x.copy()
        life = 1.0 / (cfg.substeps - k)
        x, v, C, F, ext = oracle_substep_cloth_mixed(
            x, v, C, F, dt=cfg.dt, n_grid=cfg.n_grid, mpm_scale=1.0,
            mu=mu, lam=lam, gravity=(0.0, -5.0, 0.0), faces=faces,
            cloth_x=cloth_x, cloth_v=cloth_v, cid=cid, pen=pen, life=life,
            friction=1.0, softness=666.0, sticky=True,
            material_model=0, ptype=0, ground_friction=1.5)
        ext_sum += ext
        cid_new = oracle_cloth_pair(faces, cloth_x, x, pen)
        pen = oracle_cloth_trace_after_mpm(
            faces, nb, nd, cloth_x, x, x_prev, cid, pen, cid_new)
        cid = cid_new
    return x, v, cid, pen, ext_sum


def test_cloth_substep_matches_oracle():
    """10 coupled substeps (CPU f64, dense path) vs the NumPy oracle:
    particle state to 1e-9, contact ids and penetration bits exactly,
    vertex contact forces to 1e-9."""
    (cfg, params, cparams, state0, cloth_x, cloth_v, faces, nb, nd,
     x0) = build_cloth_scene(n=256, dtype=np.float64)
    mu = float(params.mu[0]); lam = float(params.lam[0])

    s, pen_s, ext = run_engine_cloth_substeps(
        cfg, params, cparams, state0, cloth_x, cloth_v, n_sub=10)
    ox, ov, ocid, open_, oext = run_oracle_cloth_substeps(
        cfg, x0, cloth_x, cloth_v, faces, nb, nd, mu, lam, n_sub=10)

    # some particles must actually touch the cloth for this to gate anything
    assert int((ocid >= 0).sum()) > 20
    assert float(np.abs(oext).max()) > 0

    np.testing.assert_allclose(np.asarray(s.x).T, ox, atol=1e-9)
    np.testing.assert_allclose(np.asarray(s.v).T, ov, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(pen_s.contact_id), ocid)
    np.testing.assert_array_equal(np.asarray(pen_s.penetration), open_)
    np.testing.assert_allclose(np.asarray(ext), oext, atol=1e-8)


def test_cloth_substep_sorted_matches_oracle():
    """Same scene through the sorted-carry configuration (assume_sorted +
    per-substep re-sort incl. the penetration side-state) — on CPU the
    chunked kernels stay off, isolating the permutation contract the TPU
    gate relies on."""
    (cfg, params, cparams, state0, cloth_x, cloth_v, faces, nb, nd,
     x0) = build_cloth_scene(n=256, dtype=np.float64)
    mu = float(params.mu[0]); lam = float(params.lam[0])

    s, pen_s, ext = run_engine_cloth_substeps(
        cfg, params, cparams, state0, cloth_x, cloth_v, n_sub=10,
        sorted_carry=True)
    ox, ov, ocid, open_, oext = run_oracle_cloth_substeps(
        cfg, x0, cloth_x, cloth_v, faces, nb, nd, mu, lam, n_sub=10)

    np.testing.assert_allclose(np.asarray(s.x).T, ox, atol=1e-9)
    np.testing.assert_allclose(np.asarray(s.v).T, ov, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(pen_s.contact_id), ocid)
    np.testing.assert_array_equal(np.asarray(pen_s.penetration), open_)
    np.testing.assert_allclose(np.asarray(ext), oext, atol=1e-8)
