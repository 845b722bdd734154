"""Rigid-rigid (body-body) penalty contact.

The reference resolves skeleton-vs-skeleton contact inside the Jade/DART
world (``softmac/engine/rigid_simulator.py:17-45`` world + loadSkeleton,
LCP contact resolved by ``nimble.timestep`` at ``:134``). The rebuild's
differentiable penalty equivalent lives in
``RigidModel.body_contact_wrenches`` (config-gated ``RIGID.body_contact``).

Covers: head-on collision of two solid free-flying cubes (momentum
conservation, bounded interpenetration, rebound and full separation),
gradient flow through the contact vs central finite differences, the
config-off default (no interaction), and a free glass resting inside a
FIXED bowl (mixed dynamic/static pair on real assets).

Note on geometry: the clean bounce tests use SOLID bodies. Thin-shell
meshes (glass walls ~7 mm at the default ~5 mm SDF cell) resolve resting
contact only to the table's cell scale — two clinking glasses conserve
momentum and rebound but can come to rest with mm-scale overlap where the
interpolated wall SDF loses its sign structure; bake finer tables or raise
stiffness if that matters for a scene.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from softmac_tpu.config.node import CN
from softmac_tpu.engine import quat as Q
from softmac_tpu.engine.meshio import load_obj, load_urdf
from softmac_tpu.engine.rigid import RigidModel
from softmac_tpu.engine.sdf import (
    preprocess_sdf, sample_sdf_world, sdf_params_from_bake,
)

_CUBE_H = 0.05   # half-extent


def _write_cube_assets(d):
    h = _CUBE_H
    vs = [(-h, -h, -h), (h, -h, -h), (h, h, -h), (-h, h, -h),
          (-h, -h, h), (h, -h, h), (h, h, h), (-h, h, h)]
    fs = [(0, 3, 2), (0, 2, 1), (4, 5, 6), (4, 6, 7),   # -z, +z
          (0, 1, 5), (0, 5, 4), (3, 7, 6), (3, 6, 2),   # -y, +y
          (0, 4, 7), (0, 7, 3), (1, 2, 6), (1, 6, 5)]   # -x, +x
    with open(d / "cube.obj", "w") as fh:
        for v in vs:
            fh.write("v %g %g %g\n" % v)
        for f in fs:
            fh.write("f %d %d %d\n" % (f[0] + 1, f[1] + 1, f[2] + 1))
    ixx = 1.0 / 12.0 * (4 * h * h + 4 * h * h)   # solid cube, m=1
    (d / "cube.urdf").write_text(f"""<?xml version="1.0"?>
<robot name="cube">
  <link name="world"/>
  <joint name="cube_to_world" type="floating">
    <parent link="world"/> <child link="base_link"/>
    <origin xyz="0 0 0" rpy="0 0 0"/>
  </joint>
  <link name="base_link">
    <inertial>
      <origin rpy="0 0 0" xyz="0 0 0"/> <mass value="1.0"/>
      <inertia ixx="{ixx}" ixy="0" ixz="0" iyy="{ixx}" iyz="0" izz="{ixx}"/>
    </inertial>
    <collision>
      <origin rpy="0 0 0" xyz="0 0 0"/>
      <geometry><mesh filename="cube.obj" scale="1 1 1"/></geometry>
    </collision>
  </link>
</robot>""")


@pytest.fixture(scope="module")
def cube_assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("cube")
    _write_cube_assets(d)
    urdf = load_urdf(str(d / "cube.urdf"))
    v, f = load_obj(str(d / "cube.obj"))
    prim = sdf_params_from_bake(preprocess_sdf(v, f, d), jnp.float64)
    return urdf, prim


def _cfg(init_state, body_contact=True, stiffness=1e4, damping=10.0):
    cfg = CN()
    cfg.gravity = (0.0, 0.0, 0.0)
    cfg.init_state = init_state
    cfg.enable_floor = False
    cfg.floor_height = -0.08
    cfg.floor_stiffness = 1e4
    cfg.floor_damping = 10.0
    cfg.ext_grad_scale = 1.0
    cfg.body_contact = body_contact
    cfg.body_contact_stiffness = stiffness
    cfg.body_contact_damping = damping
    cfg.body_contact_friction = 0.5
    return cfg


def _two_cubes(cube_assets, gap=0.15, closing=0.5, **cfg_kw):
    """Two free-flying solid cubes on the x axis, approaching head-on.
    Returns (model, state0, prims)."""
    urdf, prim = cube_assets
    q0 = [0, 0, 0, 0.5 - gap / 2, 0.5, 0.5,
          0, 0, 0, 0.5 + gap / 2, 0.5, 0.5]
    qd0 = [0, 0, 0, closing, 0, 0,
           0, 0, 0, -closing, 0, 0]
    m = RigidModel([urdf, urdf], _cfg(tuple(q0 + qd0), **cfg_kw),
                   env_dt=1e-3, dtype=jnp.float64)
    return m, m.init_state(), (prim, prim)


def _momentum(m, s):
    """Total linear momentum and angular momentum about the world origin."""
    bs = m.body_states(s)
    P = np.zeros(3)
    L = np.zeros(3)
    for i, b in enumerate(m.bodies):
        R = np.asarray(Q.quat2mat(bs.quat[i]))
        v_com = R @ np.asarray(bs.v[i])
        w_world = R @ np.asarray(bs.w[i])
        r_com = np.asarray(bs.pos[i]) + R @ b.com
        I_w = R @ b.inertia @ R.T
        P += b.mass * v_com
        L += I_w @ w_world + b.mass * np.cross(r_com, v_com)
    return P, L


def _min_mutual_sdf(m, s, prims):
    """Deepest penetration (most negative SDF) of either body's surface
    samples inside the other body."""
    bs = m.body_states(s)
    worst = np.inf
    for a, b in ((0, 1), (1, 0)):
        pts = jnp.asarray(m.bodies[a].contact_points, jnp.float64)
        p_w = np.asarray(
            Q.qrot(jnp.broadcast_to(bs.quat[a], (pts.shape[0], 4)), pts)
            + bs.pos[a])
        sdf = np.asarray(sample_sdf_world(
            prims[b],
            (bs.pos[b][0], bs.pos[b][1], bs.pos[b][2]),
            (bs.quat[b][0], bs.quat[b][1], bs.quat[b][2], bs.quat[b][3]),
            (jnp.asarray(p_w[:, 0]), jnp.asarray(p_w[:, 1]),
             jnp.asarray(p_w[:, 2]))))
        worst = min(worst, float(sdf.min()))
    return worst


def test_two_free_bodies_collide(cube_assets):
    """Head-on impact: the bodies must exchange momentum (closing ->
    separating), conserve total linear momentum to roundoff and angular
    momentum to O(dt), never interpenetrate deeply, and fully separate."""
    m, s, prims = _two_cubes(cube_assets)
    ext0 = jnp.zeros((2, 6), jnp.float64)
    P0, L0 = _momentum(m, s)

    step = jax.jit(lambda st: m.step(st, None, ext0, prims=prims))
    deepest = np.inf
    for _ in range(400):
        s = step(s)
        deepest = min(deepest, _min_mutual_sdf(m, s, prims))
    P1, L1 = _momentum(m, s)

    # faces started 0.05 apart at closing speed 1.0: collision happened
    # and reversed the approach
    assert deepest < 0.0, "bodies never touched — scene geometry wrong"
    vx_a, vx_b = float(s.qd[3]), float(s.qd[9])
    assert vx_a < 0.0 and vx_b > 0.0, (vx_a, vx_b)
    # bounded interpenetration (cube half-extent 0.05)
    assert deepest > -0.02, deepest
    # equal-opposite forces at shared world points: linear momentum exact,
    # angular momentum O(dt) per step through the impact
    np.testing.assert_allclose(P1, P0, atol=1e-10)
    np.testing.assert_allclose(L1, L0, atol=5e-4)
    # fully separated and clear of each other at the end
    assert _min_mutual_sdf(m, s, prims) > 0.0
    assert float(s.q[9]) - float(s.q[3]) > 2 * _CUBE_H


def test_body_contact_off_by_default(cube_assets):
    """With body_contact off the cubes pass through each other untouched
    (the pre-round-4 behavior)."""
    m, s, prims = _two_cubes(cube_assets, body_contact=False)
    assert not m.body_contact
    ext0 = jnp.zeros((2, 6), jnp.float64)
    step = jax.jit(lambda st: m.step(st, None, ext0))  # no prims needed
    for _ in range(400):
        s = step(s)
    # velocities unchanged: no interaction at all
    np.testing.assert_allclose(float(s.qd[3]), 0.5, atol=1e-12)
    np.testing.assert_allclose(float(s.qd[9]), -0.5, atol=1e-12)


def test_body_contact_gradient_matches_fd(cube_assets):
    """d(final pose of body B) / d(push force on body A) flows THROUGH the
    contact and matches central finite differences."""
    m, s0, prims = _two_cubes(cube_assets, gap=0.12, closing=0.3)
    ext0 = jnp.zeros((2, 6), jnp.float64)

    @jax.jit
    def final_bx(push):
        action = jnp.zeros((12,), jnp.float64).at[3].set(push)

        def body(s, _):
            return m.step(s, action, ext0, prims=prims), None

        s, _ = jax.lax.scan(body, s0, None, length=120)
        return s.q[9]          # body B x position: reachable only via contact

    g = float(jax.grad(final_bx)(0.0))
    eps = 1e-3
    fd = (float(final_bx(eps)) - float(final_bx(-eps))) / (2 * eps)
    assert g != 0.0
    np.testing.assert_allclose(g, fd, rtol=1e-5)


def test_env_rollout_with_body_contact():
    """The FULL production pipeline (SoftMacEnv jitted rollout + jax.grad:
    MPM substeps, mixed contact, floating rigid step) compiles and runs
    with RIGID.body_contact on — prims thread through _env_step_fn into
    RigidModel.step, and gradients stay finite through the added wrench."""
    from pathlib import Path

    from softmac_tpu import SoftMacEnv, load

    root = Path(__file__).resolve().parents[1]
    cfg = load(str(root / "softmac_tpu/config/demo_pour_config.py"))
    cfg.defrost()
    cfg.RIGID.body_contact = True
    cfg.freeze()
    base = np.load(root / "envs/pour/pour_mpm_init_state_corotated.npy")
    rng = np.random.RandomState(3)
    pick = rng.choice(base.shape[0], 200, replace=False)
    env = SoftMacEnv(cfg, init_particles=base[pick, :3] + [0.0, 0.04, 0.0])
    assert env.rigid_model.body_contact

    actions = np.zeros((2, env.action_dim))
    out = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=2)
    assert np.isfinite(float(out["loss"]))
    g = np.asarray(out["action_grad"])
    assert np.isfinite(g).all() and np.abs(g).sum() > 0


def _write_fixed_cube_urdf(d):
    """Same cube mesh, anchored to the world by a fixed joint at
    (0.5, 0.5, 0.5)."""
    (d / "cube_fixed.urdf").write_text("""<?xml version="1.0"?>
<robot name="cube_fixed">
  <link name="world"/>
  <joint name="cube_to_world" type="fixed">
    <parent link="world"/> <child link="base_link"/>
    <origin xyz="0.5 0.5 0.5" rpy="0 0 0"/>
  </joint>
  <link name="base_link">
    <inertial>
      <origin rpy="0 0 0" xyz="0 0 0"/> <mass value="1.0"/>
      <inertia ixx="0.001" ixy="0" ixz="0" iyy="0.001" iyz="0" izz="0.001"/>
    </inertial>
    <collision>
      <origin rpy="0 0 0" xyz="0 0 0"/>
      <geometry><mesh filename="cube.obj" scale="1 1 1"/></geometry>
    </collision>
  </link>
</robot>""")


@pytest.mark.parametrize("stick,stiffness,damping,creeps", [
    (0.0, 1e5, 10.0, True),    # legacy viscous at a stiff/low-damping point
    (0.9, 2e3, 50.0, False),   # stick branch at a settled contact
])
def test_static_friction_stick(cube_assets, tmp_path_factory, stick,
                               stiffness, damping, creeps):
    """The LCP-parity gap (PARITY.md): a cube resting on a fixed cube under
    tilted gravity (driving force 1 N, cone limit mu*m*g ~ 4.9 N).

    The legacy Coulomb-clamped VISCOUS friction ties tangential hold to the
    normal-damping knob: holding requires damping * n_active to dwarf the
    driving force, and at a stiff/low-damping operating point (1e5/10,
    where the face contact chatters) the cube slides off at ~0.1 m/s. The
    stick branch (body_contact_stick=0.9) instead cancels the pair's mean
    tangential momentum each step, Coulomb-clamped — holding is bounded by
    the friction CONE alone, independent of damping, like the reference's
    LCP contact; residual motion is chatter around zero with sub-mm
    drift."""
    urdf_free, prim = cube_assets
    d = tmp_path_factory.mktemp("fixed_cube")
    _write_cube_assets(d)
    _write_fixed_cube_urdf(d)
    urdf_fixed = load_urdf(str(d / "cube_fixed.urdf"))

    # free cube stacked exactly on top of the fixed one
    cfg = _cfg(tuple([0, 0, 0, 0.5, 0.5 + 2 * _CUBE_H, 0.5] + [0] * 6),
               stiffness=stiffness, damping=damping)
    cfg.gravity = (1.0, -9.8, 0.0)       # 1 N lateral drive on the 1 kg cube
    cfg.body_contact_stick = stick
    m = RigidModel([urdf_free, urdf_fixed], cfg, env_dt=1e-3,
                   dtype=jnp.float64)
    assert [b.jtype for b in m.bodies] == ["floating", "fixed"]
    assert m._contact_pairs == [(0, 1)]

    prims = (prim, prim)
    ext0 = jnp.zeros((2, 6), jnp.float64)
    step = jax.jit(lambda st: m.step(st, None, ext0, prims=prims))
    s = m.init_state()
    for _ in range(500):
        s = step(s)
    vx, x = float(s.qd[3]), float(s.q[3])
    # supported in both modes (normal force holds the stack)
    assert 0.57 < float(s.q[4]) < 0.62, float(s.q[4])
    if creeps:
        # viscous: slides at ~F/damping once the chattering contact lets go
        assert vx > 0.05, vx
        assert x - 0.5 > 0.02, x
    else:
        # stuck: chatter-level velocity around 0, displacement sub-mm
        assert abs(vx) < 1e-2, vx
        assert abs(x - 0.5) < 2e-3, x


def test_mixed_static_pair():
    """A free glass dropped onto a FIXED bowl (bowl_fixed.urdf: fixed
    joint) comes to rest supported by the contact instead of falling
    through — the static side feels no dynamics but still blocks."""
    glass = load_urdf("assets/glass/glass.urdf")
    bowl = load_urdf("assets/bowl/bowl_fixed.urdf")
    # bowl_fixed.urdf anchors the bowl at (0.66, 0.127, 0.5); the bowl
    # interior floor is at y~0.065, so a glass (bottom -0.235 body frame)
    # rests near y~0.30. Drop from 0.36 — a short drop INSIDE the cavity
    # (a higher drop bounces chaotically off the thin rim and can
    # legitimately tumble out of the bowl)
    cfg = _cfg(tuple([0, 0, 0, 0.66, 0.36, 0.5] + [0] * 6),
               stiffness=5e4, damping=100.0)
    cfg.gravity = (0.0, -9.8, 0.0)
    m = RigidModel([glass, bowl], cfg, env_dt=1e-3, dtype=jnp.float64)
    assert [b.jtype for b in m.bodies] == ["floating", "fixed"]
    assert m._contact_pairs == [(0, 1)]

    gv, gf = load_obj("assets/glass/glass.obj")
    bv, bf = load_obj("assets/bowl/bowl.obj")
    prims = (sdf_params_from_bake(preprocess_sdf(gv, gf, "assets/glass"),
                                  jnp.float64),
             sdf_params_from_bake(preprocess_sdf(bv, bf, "assets/bowl"),
                                  jnp.float64))
    ext0 = jnp.zeros((2, 6), jnp.float64)
    step = jax.jit(lambda st: m.step(st, None, ext0, prims=prims))
    s = m.init_state()
    for _ in range(600):
        s = step(s)
    # settled: resting inside the bowl (supported, not fallen through the
    # fixed geometry), laterally contained, nearly static. Checked at the
    # settled phase (~0.2 s after impact): the Coulomb-clamped VISCOUS
    # friction has no static branch, so over multi-second horizons the
    # glass creeps mm/s down the curved bowl floor (an LCP like Jade's
    # would pin it) — a documented penalty-model limitation, not a support
    # failure.
    assert 0.25 < float(s.q[4]) < 0.40, float(s.q[4])
    assert abs(float(s.q[3]) - 0.66) < 0.02, float(s.q[3])
    assert abs(float(s.qd[4])) < 0.05, float(s.qd[4])
