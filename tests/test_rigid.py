import jax
import jax.numpy as jnp
import numpy as np

from softmac_tpu.config.node import CN
from softmac_tpu.engine.meshio import load_urdf
from softmac_tpu.engine.rigid import RigidModel, RigidState


def rigid_cfg(init_state=(), gravity=(0.0, -9.8, 0.0), enable_floor=False):
    cfg = CN()
    cfg.gravity = gravity
    cfg.init_state = init_state
    cfg.enable_floor = enable_floor
    cfg.floor_height = -0.08
    cfg.floor_stiffness = 1e4
    cfg.floor_damping = 10.0
    cfg.ext_grad_scale = 1.0
    return cfg


def glass_model(**kw):
    urdf = load_urdf("assets/glass/glass.urdf")
    init = kw.pop("init_state", (0, 0, 0, 0.5, 0.5, 0.5, 0, 0, 0, 0, 0, 0))
    return RigidModel([urdf], rigid_cfg(init_state=init, **kw), env_dt=1e-3,
                      dtype=jnp.float64)


def test_free_body_ballistic():
    m = glass_model()
    s = m.init_state()
    zero_ext = jnp.zeros((1, 6), jnp.float64)
    T = 100
    for _ in range(T):
        s = m.step(s, None, zero_ext)
    # semi-implicit Euler free fall: y(T) = y0 - g*dt^2 * T(T+1)/2
    dt, g = 1e-3, 9.8
    y_expect = 0.5 - g * dt * dt * T * (T + 1) / 2
    np.testing.assert_allclose(float(s.q[4]), y_expect, atol=1e-10)
    np.testing.assert_allclose(float(s.qd[4]), -g * dt * T, atol=1e-10)


def test_free_body_force_action():
    m = glass_model(gravity=(0.0, 0.0, 0.0))
    s = m.init_state()
    mass = m.bodies[0].mass
    action = jnp.zeros((6,), jnp.float64).at[3].set(1.0)  # 1 N along x
    zero_ext = jnp.zeros((1, 6), jnp.float64)
    for _ in range(50):
        s = m.step(s, action, zero_ext)
    v_expect = 1.0 / mass * 1e-3 * 50
    np.testing.assert_allclose(float(s.qd[3]), v_expect, rtol=1e-10)


def test_free_body_torque_spin():
    m = glass_model(gravity=(0.0, 0.0, 0.0))
    s = m.init_state()
    Iyy = m.bodies[0].inertia[1, 1]
    action = jnp.zeros((6,), jnp.float64).at[1].set(0.01)  # torque about y
    zero_ext = jnp.zeros((1, 6), jnp.float64)
    for _ in range(20):
        s = m.step(s, action, zero_ext)
    w_expect = 0.01 / Iyy * 1e-3 * 20
    np.testing.assert_allclose(float(s.qd[1]), w_expect, rtol=1e-4)
    # rotation vector dominated by y (tiny x/z from off-diagonal inertia)
    assert abs(float(s.q[1])) > 1e-6
    np.testing.assert_allclose(float(s.q[0]), 0.0, atol=1e-6)


def test_revolute_door():
    urdf = load_urdf("assets/door/door.urdf")
    m = RigidModel([urdf], rigid_cfg(init_state=(0.0, 0.0)), env_dt=1e-3,
                   dtype=jnp.float64)
    assert m.state_dim == 2 and m.bodies[0].jtype == "revolute"
    s = m.init_state()
    I_a = float(m.bodies[0].axis @ m.bodies[0].inertia @ m.bodies[0].axis)
    tau = 1e-5
    zero_ext = jnp.zeros((1, 6), jnp.float64)
    qd = 0.0
    q = 0.0
    for _ in range(30):
        s = m.step(s, jnp.asarray([tau]), zero_ext)
        qd += 1e-3 * tau / I_a
        q += 1e-3 * qd
    np.testing.assert_allclose(float(s.q[0]), q, rtol=1e-10)
    # body pose: rotation about world y at the hinge
    b = m.body_states(s)
    np.testing.assert_allclose(np.asarray(b.pos[0]), [0.25, 0.0, 0.3], atol=1e-12)
    np.testing.assert_allclose(float(b.quat[0, 0]), np.cos(q / 2), atol=1e-9)


def test_gripper_prismatic():
    urdf = load_urdf("assets/gripper/gripper.urdf")
    m = RigidModel([urdf], rigid_cfg(init_state=(0.0, 0.0, 0.0, 0.0)),
                   env_dt=1e-3, dtype=jnp.float64)
    assert m.n_primitives == 3  # palm + 2 fingers
    assert [b.jtype for b in m.bodies] == ["fixed", "prismatic", "prismatic"]
    s = m.init_state()
    zero_ext = jnp.zeros((3, 6), jnp.float64)
    action = jnp.asarray([1.0, -1.0])  # close the fingers
    for _ in range(50):
        s = m.step(s, action, zero_ext)
    assert float(s.q[0]) > 0 and float(s.q[1]) < 0
    b = m.body_states(s)
    # palm fixed at its URDF origin
    np.testing.assert_allclose(np.asarray(b.pos[0]), [0.5, 0.45, 0.5], atol=1e-12)
    # fingers moved along x from their joint origins
    np.testing.assert_allclose(
        float(b.pos[1][0]), 0.5 - 0.15 + float(s.q[0]), atol=1e-12)


def test_floor_penalty():
    # glass mesh bottom is at -0.235 in body frame; start just above the floor
    m = glass_model(init_state=(0, 0, 0, 0.5, 0.2, 0.5, 0, 0, 0, 0, 0, 0),
                    enable_floor=True)
    m.floor_damping = 100.0
    s = m.init_state()
    zero_ext = jnp.zeros((1, 6), jnp.float64)
    for _ in range(3000):
        s = m.step(s, None, zero_ext)
    # body must not fall through the floor (mesh bottom stays near floor_height)
    mesh_bottom = m.bodies[0].support_points[:, 1].min()
    assert float(s.q[4]) + mesh_bottom > -0.12
    assert abs(float(s.qd[4])) < 1.0


def test_rigid_gradients():
    m = glass_model(gravity=(0.0, 0.0, 0.0))
    zero_ext = jnp.zeros((1, 6), jnp.float64)

    def final_x(action):
        s = m.init_state()
        for _ in range(10):
            s = m.step(s, action, zero_ext)
        return s.q[3]

    a0 = jnp.zeros((6,), jnp.float64)
    g = jax.grad(final_x)(a0)
    eps = 1e-6
    fd = (final_x(a0.at[3].add(eps)) - final_x(a0.at[3].add(-eps))) / (2 * eps)
    np.testing.assert_allclose(float(g[3]), float(fd), rtol=1e-6)
    assert np.all(np.isfinite(np.asarray(g)))


# ======================================================================
# Velocity frame conventions (set_ext_state parity: body_states must export
# BODY-frame COM spatial velocity, which contact rotates body->world)
# ======================================================================
def test_body_states_body_frame_velocity():
    """A body rotated 90deg about z with world w=(1,0,0): the surface point
    at world offset r=(0,0,1) moves at w x r = (0,-1,0). collider_velocity
    rotates body->world, so body_states must hand it body-frame (w, v)."""
    from softmac_tpu.engine.contact import collider_velocity

    m = glass_model(gravity=(0.0, 0.0, 0.0))
    s = RigidState(
        q=jnp.asarray([0.0, 0.0, np.pi / 2, 0.5, 0.5, 0.5], jnp.float64),
        qd=jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.0, 0.0], jnp.float64))
    b = m.body_states(s)
    # body frame = world rotated 90deg about z: world x maps to body -y
    np.testing.assert_allclose(np.asarray(b.w[0]), [0.0, -1.0, 0.0], atol=1e-12)

    bq = tuple(b.quat[0, i] for i in range(4))
    bv = tuple(b.v[0, i] for i in range(3))
    bw = tuple(b.w[0, i] for i in range(3))
    r = (jnp.float64(0.0), jnp.float64(0.0), jnp.float64(1.0))
    cv = collider_velocity(bq, bv, bw, r)
    np.testing.assert_allclose([float(c) for c in cv], [0.0, -1.0, 0.0],
                               atol=1e-12)


def _box_urdf(tmp_path, jtype, inertial_xyz, mass=0.1,
              izz=1e-4, axis="0 0 1"):
    obj = tmp_path / "box.obj"
    lo, hi = -0.01, 0.01
    verts = [(x, y, z) for x in (lo, hi) for y in (lo, hi) for z in (lo, hi)]
    lines = [f"v {x} {y} {z}" for x, y, z in verts]
    lines += ["f 1 2 4 3", "f 5 7 8 6", "f 1 5 6 2",
              "f 3 4 8 7", "f 1 3 7 5", "f 2 6 8 4"]
    obj.write_text("\n".join(lines) + "\n")
    urdf = tmp_path / "box.urdf"
    urdf.write_text(f"""<?xml version="1.0"?>
<robot name="box">
  <link name="world"/>
  <joint name="j" type="{jtype}">
    <parent link="world"/> <child link="base"/>
    <origin xyz="0 0 0" rpy="0 0 0"/> <axis xyz="{axis}"/>
  </joint>
  <link name="base">
    <inertial>
      <origin rpy="0 0 0" xyz="{inertial_xyz}"/>
      <mass value="{mass}"/>
      <inertia ixx="{izz}" ixy="0" ixz="0" iyy="{izz}" iyz="0" izz="{izz}"/>
    </inertial>
    <collision><geometry><mesh filename="box.obj"/></geometry></collision>
  </link>
</robot>
""")
    return load_urdf(urdf)


def test_pendulum_off_axis_com(tmp_path):
    """Compound pendulum: revolute about z through the origin, COM at
    (d,0,0), gravity -y. Small oscillations about the hanging equilibrium
    theta=-pi/2 follow phi(t) = phi0*cos(w*t), w^2 = m*g*d / (Izz + m*d^2)."""
    mass, izz, d, g = 0.1, 1e-4, 0.05, 9.8
    urdf = _box_urdf(tmp_path, "revolute", f"{d} 0 0", mass=mass, izz=izz)
    dt = 1e-4
    m = RigidModel([urdf], rigid_cfg(init_state=(0.0, 0.0)), env_dt=dt,
                   dtype=jnp.float64)
    I_axis = izz + mass * d * d
    omega = np.sqrt(mass * g * d / I_axis)

    phi0 = 0.05
    s = RigidState(q=jnp.asarray([-np.pi / 2 + phi0]),
                   qd=jnp.asarray([0.0]))
    zero_ext = jnp.zeros((1, 6), jnp.float64)
    quarter = int(round((np.pi / 2) / omega / dt))
    step = jax.jit(lambda s: m.step(s, None, zero_ext))
    import jax.lax as lax
    s = lax.fori_loop(0, quarter, lambda i, s: step(s), s)
    # at a quarter period the pendulum crosses equilibrium
    phi = float(s.q[0]) + np.pi / 2
    assert abs(phi) < 0.15 * phi0
    # and moves at the analytic peak speed phi0*omega
    np.testing.assert_allclose(abs(float(s.qd[0])), phi0 * omega, rtol=2e-2)


def test_floating_com_offset_force_couples_rotation(tmp_path):
    """A world force applied at the body origin of a floating body with COM
    offset c exerts torque -r_c x F about the COM -> the body must rotate;
    gravity alone (acting AT the COM) must not."""
    mass, izz, d = 0.1, 1e-4, 0.05
    urdf = _box_urdf(tmp_path, "floating", f"0 {d} 0", mass=mass, izz=izz)
    dt = 1e-4
    cfg = rigid_cfg(init_state=(0, 0, 0, 0.5, 0.5, 0.5, 0, 0, 0, 0, 0, 0))
    m = RigidModel([urdf], cfg, env_dt=dt, dtype=jnp.float64)
    zero_ext = jnp.zeros((1, 6), jnp.float64)

    # gravity only: COM free-falls, no rotation appears
    s = m.init_state()
    for _ in range(100):
        s = m.step(s, None, zero_ext)
    np.testing.assert_allclose(np.asarray(s.qd[:3]), 0.0, atol=1e-12)
    T = 100
    y_expect = 0.5 - 9.8 * dt * dt * T * (T + 1) / 2
    np.testing.assert_allclose(float(s.q[4]), y_expect, atol=1e-10)

    # force along +x at the origin, COM at +y above it: torque about COM is
    # -r_c x F = -(d*ey) x (F*ex) = +d*F*ez -> positive spin about z
    m2 = RigidModel([urdf], cfg, env_dt=dt, dtype=jnp.float64)
    m2.gravity = np.zeros(3)
    action = jnp.zeros((6,), jnp.float64).at[3].set(1.0)
    s = m2.init_state()
    s = m2.step(s, action, zero_ext)
    w_z = float(s.qd[2])
    np.testing.assert_allclose(w_z, dt * (d * 1.0) / izz, rtol=1e-9)
    # COM acceleration is F/m regardless of the couple (reconstruct r_c at
    # the post-step orientation, which the integrator rotated slightly)
    from softmac_tpu.engine import quat as Q
    r_c = np.asarray(Q.qrot(Q.w2quat(s.q[:3]), jnp.asarray([0.0, d, 0.0])))
    vc = np.asarray(s.qd[3:]) + np.cross(np.asarray(s.qd[:3]), r_c)
    np.testing.assert_allclose(vc, [dt * 1.0 / mass, 0, 0], atol=1e-12)


def _welded_pendulum_urdf(tmp_path, m1=0.3, L1=0.1, m2=0.15, L=0.2):
    """Revolute rod (point mass m1 at -L1 y) with a tip mass m2 WELDED at
    -L y: the composite must behave as one compound pendulum."""
    obj = tmp_path / "bit.obj"
    lo, hi = -0.01, 0.01
    verts = [(x, y, z) for x in (lo, hi) for y in (lo, hi) for z in (lo, hi)]
    lines = [f"v {x} {y} {z}" for x, y, z in verts]
    lines += ["f 1 2 4 3", "f 5 7 8 6", "f 1 5 6 2",
              "f 3 4 8 7", "f 1 3 7 5", "f 2 6 8 4"]
    obj.write_text("\n".join(lines) + "\n")
    urdf = tmp_path / "weld.urdf"
    urdf.write_text(f"""<?xml version="1.0"?>
<robot name="weldpend">
  <link name="world"/>
  <joint name="j1" type="revolute">
    <parent link="world"/> <child link="rod"/>
    <origin xyz="0 0 0" rpy="0 0 0"/> <axis xyz="0 0 1"/>
  </joint>
  <link name="rod">
    <inertial>
      <origin rpy="0 0 0" xyz="0 {-L1} 0"/>
      <mass value="{m1}"/>
      <inertia ixx="0" ixy="0" ixz="0" iyy="0" iyz="0" izz="0"/>
    </inertial>
    <collision><geometry><mesh filename="bit.obj"/></geometry></collision>
  </link>
  <joint name="wj" type="fixed">
    <parent link="rod"/> <child link="tip"/>
    <origin xyz="0 {-L} 0" rpy="0 0 0"/>
  </joint>
  <link name="tip">
    <inertial>
      <origin rpy="0 0 0" xyz="0 0 0"/>
      <mass value="{m2}"/>
      <inertia ixx="0" ixy="0" ixz="0" iyy="0" iyz="0" izz="0"/>
    </inertial>
    <collision><geometry><mesh filename="bit.obj"/></geometry></collision>
  </link>
</robot>
""")
    return load_urdf(urdf)


def test_weld_composite_pendulum(tmp_path):
    """Welded tip mass folds into the revolute rod: small oscillations match
    the compound pendulum w^2 = g(m1 L1 + m2 L)/(m1 L1^2 + m2 L^2), and the
    weld primitive's pose/velocity ride the parent."""
    m1, L1, m2, L = 0.3, 0.1, 0.15, 0.2
    g, dt = 9.8, 1e-4
    urdf = _welded_pendulum_urdf(tmp_path, m1, L1, m2, L)
    m = RigidModel([urdf], rigid_cfg(init_state=(0.0, 0.0)), env_dt=dt,
                   dtype=jnp.float64)
    assert [b.jtype for b in m.bodies] == ["revolute", "weld"]
    assert m.action_dim == 1
    # composite inertials on the parent
    np.testing.assert_allclose(m.bodies[0].mass, m1 + m2, rtol=1e-12)
    c_t = (m1 * L1 + m2 * L) / (m1 + m2)
    np.testing.assert_allclose(m.bodies[0].com, [0.0, -c_t, 0.0], atol=1e-12)

    I_axis = m1 * L1 ** 2 + m2 * L ** 2
    omega = np.sqrt(g * (m1 * L1 + m2 * L) / I_axis)
    phi0 = 0.05
    # this URDF hangs along -y at q=0, so q measures from equilibrium
    s = RigidState(q=jnp.asarray([phi0]), qd=jnp.asarray([0.0]))
    zero_ext = jnp.zeros((2, 6), jnp.float64)
    step = jax.jit(lambda s: m.step(s, None, zero_ext))
    quarter = int(round((np.pi / 2) / omega / dt))
    import jax.lax as lax
    s = lax.fori_loop(0, quarter, lambda i, s: step(s), s)
    assert abs(float(s.q[0])) < 0.15 * phi0
    np.testing.assert_allclose(abs(float(s.qd[0])), phi0 * omega, rtol=2e-2)

    # weld primitive kinematics at a known state
    sq = RigidState(q=jnp.asarray([0.3]), qd=jnp.asarray([1.7]))
    b = m.body_states(sq)
    R = np.array([[np.cos(0.3), -np.sin(0.3), 0],
                  [np.sin(0.3), np.cos(0.3), 0], [0, 0, 1.0]])
    np.testing.assert_allclose(np.asarray(b.pos[1]), R @ [0, -L, 0],
                               atol=1e-12)
    # weld COM spatial velocity (body frame): w x r at r=(0,-L,0), w=1.7 z
    np.testing.assert_allclose(np.asarray(b.w[1]), [0, 0, 1.7], atol=1e-12)
    np.testing.assert_allclose(np.asarray(b.v[1]),
                               np.cross([0, 0, 1.7], [0, -L, 0]), atol=1e-12)


def test_weld_wrench_folds_to_parent(tmp_path):
    """A contact force on the WELD primitive torques the composite about the
    parent joint: qd after one step = dt * (r x f).axis / I_composite."""
    m1, L1, m2, L = 0.3, 0.1, 0.15, 0.2
    dt = 1e-4
    urdf = _welded_pendulum_urdf(tmp_path, m1, L1, m2, L)
    m = RigidModel([urdf], rigid_cfg(init_state=(0.0, 0.0),
                                     gravity=(0.0, 0.0, 0.0)), env_dt=dt,
                   dtype=jnp.float64)
    fx = 0.8
    ext = jnp.zeros((2, 6), jnp.float64).at[1, 0].set(fx)
    s = m.step(RigidState(q=jnp.asarray([0.0]), qd=jnp.asarray([0.0])),
               None, ext)
    I_axis = m1 * L1 ** 2 + m2 * L ** 2
    np.testing.assert_allclose(float(s.qd[0]), dt * L * fx / I_axis,
                               rtol=1e-9)


def test_revolute_with_origin_rpy_body_frame(tmp_path):
    """A hinge whose URDF <origin rpy> != 0: the exported body rotation must
    be joint_rot @ R(axis*q) (the old R(axis_w*q) form is off by a
    joint_rot similarity), and the settled equilibrium under gravity +
    damping must minimize the COM's potential energy on the tilted circle."""
    obj = tmp_path / "box.obj"
    lo, hi = -0.01, 0.01
    verts = [(x, y, z) for x in (lo, hi) for y in (lo, hi) for z in (lo, hi)]
    lines = [f"v {x} {y} {z}" for x, y, z in verts]
    lines += ["f 1 2 4 3", "f 5 7 8 6", "f 1 5 6 2",
              "f 3 4 8 7", "f 1 3 7 5", "f 2 6 8 4"]
    obj.write_text("\n".join(lines) + "\n")
    rx = 0.5236  # 30 deg about x
    urdf = tmp_path / "tilt.urdf"
    urdf.write_text(f"""<?xml version="1.0"?>
<robot name="tilt">
  <link name="world"/>
  <joint name="j" type="revolute">
    <parent link="world"/> <child link="arm"/>
    <origin xyz="0 0 0" rpy="{rx} 0 0"/> <axis xyz="0 0 1"/>
  </joint>
  <link name="arm">
    <inertial>
      <origin rpy="0 0 0" xyz="0.08 0 0"/>
      <mass value="0.2"/>
      <inertia ixx="1e-5" ixy="0" ixz="0" iyy="1e-5" iyz="0" izz="1e-5"/>
    </inertial>
    <collision><geometry><mesh filename="box.obj"/></geometry></collision>
  </link>
</robot>
""")
    cfg = rigid_cfg(init_state=(0.3, 0.0))
    cfg.joint_damping = 2e-3
    m = RigidModel([load_urdf(urdf)], cfg, env_dt=1e-3, dtype=jnp.float64)

    def Rx(a):
        return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                         [0, np.sin(a), np.cos(a)]])

    def Rz(a):
        return np.array([[np.cos(a), -np.sin(a), 0],
                         [np.sin(a), np.cos(a), 0], [0, 0, 1]])

    # exported orientation composes the static joint rotation
    from softmac_tpu.engine import quat as Q
    th = 0.3
    b = m.body_states(RigidState(q=jnp.asarray([th]), qd=jnp.asarray([0.7])))
    R_w = np.asarray(Q.quat2mat(jnp.asarray(b.quat[0])))
    np.testing.assert_allclose(R_w, Rx(rx) @ Rz(th), atol=1e-12)
    # body-frame angular velocity is along the LINK-frame axis
    np.testing.assert_allclose(np.asarray(b.w[0]), [0, 0, 0.7], atol=1e-12)

    # settle with damping; equilibrium must minimize PE over the hinge circle
    s = m.init_state()
    step = jax.jit(lambda s: m.step(s, None, jnp.zeros((1, 6), jnp.float64)))
    import jax.lax as lax
    s = lax.fori_loop(0, 20000, lambda i, s: step(s), s)
    com = np.array([0.08, 0.0, 0.0])
    grid = np.linspace(-np.pi, np.pi, 20001)
    pe = [-(Rx(rx) @ Rz(t) @ com)[1] * (-9.8) for t in grid]
    th_star = grid[int(np.argmin(pe))]
    assert abs(float(s.qd[0])) < 1e-3          # settled
    np.testing.assert_allclose(float(s.q[0]), th_star, atol=2e-3)


def test_weld_ext_force_flags_per_primitive(tmp_path):
    """Each primitive's measured wrench is gated by ITS OWN flag: contact on
    an enabled weld drives the (flag-disabled) carrier, and a disabled weld
    contributes nothing even when the carrier is enabled."""
    m1, L1, m2, L = 0.3, 0.1, 0.15, 0.2
    dt = 1e-4
    urdf = _welded_pendulum_urdf(tmp_path, m1, L1, m2, L)
    cfg = rigid_cfg(init_state=(0.0, 0.0), gravity=(0.0, 0.0, 0.0))
    fx = 0.8
    ext = jnp.zeros((2, 6), jnp.float64).at[1, 0].set(fx)
    I_axis = m1 * L1 ** 2 + m2 * L ** 2
    s0 = RigidState(q=jnp.asarray([0.0]), qd=jnp.asarray([0.0]))

    m = RigidModel([urdf], cfg, env_dt=dt, dtype=jnp.float64,
                   ext_force_flags=(False, True))
    s = m.step(s0, None, ext)
    np.testing.assert_allclose(float(s.qd[0]), dt * L * fx / I_axis,
                               rtol=1e-9)

    m = RigidModel([urdf], cfg, env_dt=dt, dtype=jnp.float64,
                   ext_force_flags=(True, False))
    s = m.step(s0, None, ext)
    np.testing.assert_allclose(float(s.qd[0]), 0.0, atol=1e-15)


def test_adjust_action_weld_contact_folds_once(tmp_path):
    """adjust_action_with_ext_force on a floating body carrying a welded
    mesh in MPM contact: the compensation must equal minus the measured
    wrench folded ONCE onto the carrier (model.step performs its own weld
    fold on the raw ext_f — pre-folding what is passed to it would double-
    count the weld's contact wrench)."""
    from softmac_tpu import SoftMacEnv, get_cfg_defaults
    from softmac_tpu.config.node import CN

    obj = tmp_path / "wbox.obj"
    lo, hi = -0.04, 0.04
    verts = [(x, y, z) for x in (lo, hi) for y in (lo, hi) for z in (lo, hi)]
    lines = [f"v {x} {y} {z}" for x, y, z in verts]
    lines += ["f 1 2 4 3", "f 5 7 8 6", "f 1 5 6 2",
              "f 3 4 8 7", "f 1 3 7 5", "f 2 6 8 4"]
    obj.write_text("\n".join(lines) + "\n")
    urdf = tmp_path / "carrier.urdf"
    urdf.write_text("""<?xml version="1.0"?>
<robot name="carrier">
  <link name="world"/>
  <joint name="root" type="floating">
    <parent link="world"/> <child link="base"/>
  </joint>
  <link name="base">
    <inertial>
      <origin rpy="0 0 0" xyz="0 0 0"/>
      <mass value="0.5"/>
      <inertia ixx="5e-4" ixy="0" ixz="0" iyy="5e-4" iyz="0" izz="5e-4"/>
    </inertial>
    <collision><geometry><mesh filename="wbox.obj"/></geometry></collision>
  </link>
  <joint name="weldj" type="fixed">
    <parent link="base"/> <child link="plate"/>
    <origin xyz="0.12 0 0" rpy="0 0 0"/>
  </joint>
  <link name="plate">
    <inertial>
      <origin rpy="0 0 0" xyz="0 0 0"/>
      <mass value="0.2"/>
      <inertia ixx="2e-4" ixy="0" ixz="0" iyy="2e-4" iyz="0" izz="2e-4"/>
    </inertial>
    <collision><geometry><mesh filename="wbox.obj"/></geometry></collision>
  </link>
</robot>
""")
    G = 9.8
    cfg = get_cfg_defaults()
    cfg.control_mode = "rigid"
    cfg.env_dt = 1e-3
    cfg.SIMULATOR.dt = 1e-3
    cfg.SIMULATOR.ptype = 1
    cfg.SIMULATOR.material_model = 0
    cfg.SIMULATOR.E = 50.0
    cfg.SIMULATOR.collision_type = 2
    # blob overlapping the WELDED plate's top face so contact fires at t=0
    cfg.SHAPES = [{"shape": "box", "width": (0.05, 0.04, 0.05),
                   "init_pos": [0.62, 0.35, 0.5], "n_particles": 256,
                   "color": 0, "init_rot": None}]
    prim = CN()
    prim.friction = 0.2
    prim.urdf_path = str(urdf)
    prim.enable_external_force = True
    cfg.PRIMITIVES = [prim]
    cfg.RIGID.gravity = (0.0, -G, 0.0)
    cfg.RIGID.enable_floor = False
    cfg.RIGID.init_state = ((0.0, 0.0, 0.0, 0.5, 0.3, 0.5)
                            + (0.0,) * 6)
    cfg.TPU.active_window = (16, 16, 16)

    env = SoftMacEnv(cfg, loss=False)
    assert env.rigid_model.bodies[1].jtype == "weld"

    env.reset()
    env.step(np.zeros(env.action_dim))
    ext0 = np.asarray(env.last_ext_f)            # (2, 6) [f, t], unfolded
    assert np.abs(ext0[1]).max() > 1e-8          # contact hit the weld prim

    adj = env.adjust_action_with_ext_force(np.zeros((1, env.action_dim)))[0]

    m = env.rigid_model
    bs = m.body_states(m.init_state())
    r = np.asarray(bs.pos[1] - bs.pos[0])
    f_c = ext0[0, :3] + ext0[1, :3]
    t_c = ext0[0, 3:] + ext0[1, 3:] + np.cross(r, ext0[1, :3])
    g = np.array([0.0, -G, 0.0])
    np.testing.assert_allclose(adj[0:3], -t_c, rtol=1e-7, atol=1e-12)
    np.testing.assert_allclose(adj[3:6], -(f_c + m.compensation_mass(0) * g),
                               rtol=1e-7, atol=1e-12)
    np.testing.assert_allclose(m.compensation_mass(0), 0.7)
