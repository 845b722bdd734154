"""Articulated serial-chain dynamics (engine/chain.py) vs independent
textbook oracles.

The chain's equations of motion are DERIVED by AD from traced energies, so
the oracle here is the classic hand-derived double-pendulum M/C/G system —
a fully independent formulation. Accelerations must agree to f64 roundoff
at arbitrary states (both sides are exact algebra at a state; no integrator
mismatch enters)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from softmac_tpu.engine.chain import ChainJoint, SerialChain

G = 9.8
M1, M2 = 0.7, 1.3
L1, L2 = 0.5, 0.8


def _double_pendulum():
    """Two point masses on massless rods, hanging along -y at q=0, rotation
    about +z; q measures the angle from the downward vertical."""
    z = np.array([0.0, 0.0, 1.0])
    j1 = ChainJoint(jtype="revolute", origin_pos=np.zeros(3),
                    origin_rot=np.eye(3), axis=z, mass=M1,
                    inertia=np.zeros((3, 3)), com=np.array([0.0, -L1, 0.0]))
    j2 = ChainJoint(jtype="revolute", origin_pos=np.array([0.0, -L1, 0.0]),
                    origin_rot=np.eye(3), axis=z, mass=M2,
                    inertia=np.zeros((3, 3)), com=np.array([0.0, -L2, 0.0]))
    return SerialChain([j1, j2], base_pos=np.zeros(3), base_rot=np.eye(3),
                       gravity=(0.0, -G, 0.0), dt=1e-4, dtype=jnp.float64)


def _oracle_qdd(q, qd):
    """Hand-derived double-pendulum M qdd = -C - G (theta from vertical)."""
    t1, t2 = q
    d1, d2 = qd
    c = np.cos(t1 - t2)
    s = np.sin(t1 - t2)
    M = np.array([[(M1 + M2) * L1 ** 2, M2 * L1 * L2 * c],
                  [M2 * L1 * L2 * c, M2 * L2 ** 2]])
    C = np.array([M2 * L1 * L2 * d2 ** 2 * s,
                  -M2 * L1 * L2 * d1 ** 2 * s])
    Gv = np.array([(M1 + M2) * G * L1 * np.sin(t1),
                   M2 * G * L2 * np.sin(t2)])
    return np.linalg.solve(M, -C - Gv)


def _chain_qdd(chain, q, qd, tau=None, wr=None):
    q = jnp.asarray(q, jnp.float64)
    qd = jnp.asarray(qd, jnp.float64)
    tau = jnp.zeros(2, jnp.float64) if tau is None else jnp.asarray(tau)
    wr = jnp.zeros((2, 6), jnp.float64) if wr is None else jnp.asarray(wr)
    q2, qd2 = chain.step(q, qd, tau, wr)
    return np.asarray((qd2 - qd) / chain.dt)


def test_double_pendulum_acceleration_matches_textbook():
    """Chain q are RELATIVE joint angles; the textbook oracle uses ABSOLUTE
    angles from the vertical: theta = (q1, q1 + q2)."""
    chain = _double_pendulum()
    rng = np.random.RandomState(0)
    for _ in range(6):
        q = rng.uniform(-2.5, 2.5, 2)
        qd = rng.uniform(-4.0, 4.0, 2)
        th = np.array([q[0], q[0] + q[1]])
        thd = np.array([qd[0], qd[0] + qd[1]])
        a = _oracle_qdd(th, thd)                  # absolute accelerations
        b = _chain_qdd(chain, q, qd)              # relative accelerations
        np.testing.assert_allclose([b[0], b[0] + b[1]], a,
                                   rtol=1e-7, atol=1e-8)


def test_energy_behavior_symplectic():
    """Undamped semi-implicit Euler: total energy stays bounded (no secular
    blow-up) over 5000 steps of a chaotic double-pendulum swing."""
    chain = _double_pendulum()
    q = jnp.asarray([2.0, 1.0], jnp.float64)
    qd = jnp.asarray([0.0, 0.0], jnp.float64)
    tau = jnp.zeros(2, jnp.float64)
    wr = jnp.zeros((2, 6), jnp.float64)

    def body(c, _):
        q, qd = c
        q, qd = chain.step(q, qd, tau, wr)
        return (q, qd), None

    e0 = float(chain.kinetic(q, qd) + chain.potential(q))
    (q, qd), _ = jax.lax.scan(jax.jit(body), (q, qd), None, length=5000)
    e1 = float(chain.kinetic(q, qd) + chain.potential(q))
    scale = (M1 + M2) * G * (L1 + L2)
    assert abs(e1 - e0) / scale < 5e-3, (e0, e1)


def test_generalized_ext_is_jacobian_transpose():
    """A world force f at link 2's joint origin must map to
    tau_i = (r_i x f) . z for both revolute joints (moment arms from each
    joint axis) — the classic J^T w, produced here by AD of the power."""
    chain = _double_pendulum()
    q = jnp.asarray([0.4, -0.3], jnp.float64)
    qd = jnp.zeros(2, jnp.float64)
    f = np.array([1.7, 0.6, 0.0])
    wr = np.zeros((2, 6))
    wr[1, :3] = f
    tau = np.asarray(chain.generalized_ext(q, qd, jnp.asarray(wr)))

    p, R = chain.fk(q)
    p = np.asarray(p)
    z = np.array([0.0, 0.0, 1.0])
    # joint 2's origin relative to each joint's axis point
    tau1 = np.cross(p[1] - p[0], f) @ z
    tau2 = 0.0  # the force acts AT joint 2's origin: no arm about joint 2
    np.testing.assert_allclose(tau, [tau1, tau2], atol=1e-12)

    # a torque about link 2's origin drives both joints equally (both axes z)
    wr = np.zeros((2, 6))
    wr[1, 3:] = [0.0, 0.0, 2.5]
    tau = np.asarray(chain.generalized_ext(q, qd, jnp.asarray(wr)))
    np.testing.assert_allclose(tau, [2.5, 2.5], atol=1e-12)


def test_prismatic_on_revolute():
    """Revolute base + prismatic slider along the (rotating) arm: at q=0,
    gravity along -y, arm along -y: the slider free-falls along the arm
    (qdd_slider = g) and the revolute sees no torque."""
    z = np.array([0.0, 0.0, 1.0])
    j1 = ChainJoint(jtype="revolute", origin_pos=np.zeros(3),
                    origin_rot=np.eye(3), axis=z, mass=0.5,
                    inertia=np.eye(3) * 1e-2, com=np.array([0.0, -0.3, 0.0]))
    j2 = ChainJoint(jtype="prismatic", origin_pos=np.array([0.0, -0.6, 0.0]),
                    origin_rot=np.eye(3), axis=np.array([0.0, -1.0, 0.0]),
                    mass=0.2, inertia=np.zeros((3, 3)), com=np.zeros(3))
    chain = SerialChain([j1, j2], base_pos=np.zeros(3), base_rot=np.eye(3),
                        gravity=(0.0, -G, 0.0), dt=1e-4, dtype=jnp.float64)
    qdd = _chain_qdd(chain, np.zeros(2), np.zeros(2))
    np.testing.assert_allclose(qdd, [0.0, G], atol=1e-9)

    # centrifugal: spinning base throws the slider outward (+axis = -y),
    # qdd_slider = g + omega^2 * r at q2 = r... at q2 = 0, r = 0.6
    qdd = _chain_qdd(chain, np.zeros(2), np.array([3.0, 0.0]))
    np.testing.assert_allclose(qdd[1], G + 9.0 * 0.6, rtol=1e-9)


def test_branching_tree_matches_hand_derived_eom():
    """Y-tree: two independent pendulums hanging from the tip of a shared
    parent link. Oracle: hand-derived M/C/G in ABSOLUTE angles (each branch
    couples to the root exactly like a double pendulum; the branches only
    couple through the root row)."""
    from softmac_tpu.engine.chain import ArticulatedTree
    m3, L3 = 0.4, 0.35
    z = np.array([0.0, 0.0, 1.0])
    j1 = ChainJoint(jtype="revolute", origin_pos=np.zeros(3),
                    origin_rot=np.eye(3), axis=z, mass=M1,
                    inertia=np.zeros((3, 3)), com=np.array([0.0, -L1, 0.0]))
    j2 = ChainJoint(jtype="revolute", origin_pos=np.array([0.0, -L1, 0.0]),
                    origin_rot=np.eye(3), axis=z, mass=M2,
                    inertia=np.zeros((3, 3)), com=np.array([0.0, -L2, 0.0]))
    j3 = ChainJoint(jtype="revolute", origin_pos=np.array([0.0, -L1, 0.0]),
                    origin_rot=np.eye(3), axis=z, mass=m3,
                    inertia=np.zeros((3, 3)), com=np.array([0.0, -L3, 0.0]))
    tree = ArticulatedTree([j1, j2, j3], base_pos=np.zeros(3),
                           base_rot=np.eye(3), gravity=(0.0, -G, 0.0),
                           dt=1e-4, dtype=jnp.float64, parents=[-1, 0, 0])

    def oracle(th, thd):
        t1, t2, t3 = th
        d1, d2, d3 = thd
        c12, s12 = np.cos(t1 - t2), np.sin(t1 - t2)
        c13, s13 = np.cos(t1 - t3), np.sin(t1 - t3)
        M = np.array([
            [(M1 + M2 + m3) * L1 ** 2, M2 * L1 * L2 * c12,
             m3 * L1 * L3 * c13],
            [M2 * L1 * L2 * c12, M2 * L2 ** 2, 0.0],
            [m3 * L1 * L3 * c13, 0.0, m3 * L3 ** 2]])
        C = np.array([M2 * L1 * L2 * d2 ** 2 * s12
                      + m3 * L1 * L3 * d3 ** 2 * s13,
                      -M2 * L1 * L2 * d1 ** 2 * s12,
                      -m3 * L1 * L3 * d1 ** 2 * s13])
        Gv = np.array([(M1 + M2 + m3) * G * L1 * np.sin(t1),
                       M2 * G * L2 * np.sin(t2),
                       m3 * G * L3 * np.sin(t3)])
        return np.linalg.solve(M, -C - Gv)

    rng = np.random.RandomState(3)
    for _ in range(5):
        q = rng.uniform(-2.0, 2.0, 3)
        qd = rng.uniform(-3.0, 3.0, 3)
        qj = jnp.asarray(q)
        qdj = jnp.asarray(qd)
        q2, qd2 = tree.step(qj, qdj, jnp.zeros(3, jnp.float64),
                            jnp.zeros((3, 6), jnp.float64))
        b = np.asarray((qd2 - qdj) / tree.dt)      # relative qdd
        th = np.array([q[0], q[0] + q[1], q[0] + q[2]])
        thd = np.array([qd[0], qd[0] + qd[1], qd[0] + qd[2]])
        a = oracle(th, thd)
        np.testing.assert_allclose([b[0], b[0] + b[1], b[0] + b[2]], a,
                                   rtol=1e-7, atol=1e-7)


def _pendulum_urdf(tmp_path, branch=False):
    """Two-link serial pendulum URDF (moving link carrying a moving child —
    the topology engine/rigid.py's closed-form paths cannot handle); with
    ``branch`` a third link also hangs from arm1's tip (Y-tree)."""
    branch_xml = "" if not branch else f"""
  <joint name="j3" type="revolute">
    <parent link="arm1"/> <child link="arm3"/>
    <origin xyz="0 {-L1} 0" rpy="0 0 0"/> <axis xyz="0 0 1"/>
  </joint>
  <link name="arm3">
    <inertial>
      <origin rpy="0 0 0" xyz="0 -0.35 0"/>
      <mass value="0.4"/>
      <inertia ixx="0" ixy="0" ixz="0" iyy="0" iyz="0" izz="0"/>
    </inertial>
    <collision><geometry><mesh filename="tip.obj"/></geometry></collision>
  </link>"""
    obj = tmp_path / "tip.obj"
    lo, hi = -0.01, 0.01
    verts = [(x, y, z) for x in (lo, hi) for y in (lo, hi) for z in (lo, hi)]
    lines = [f"v {x} {y} {z}" for x, y, z in verts]
    lines += ["f 1 2 4 3", "f 5 7 8 6", "f 1 5 6 2",
              "f 3 4 8 7", "f 1 3 7 5", "f 2 6 8 4"]
    obj.write_text("\n".join(lines) + "\n")
    urdf = tmp_path / "pend2.urdf"
    urdf.write_text(f"""<?xml version="1.0"?>
<robot name="pend2">
  <link name="world"/>
  <joint name="j1" type="revolute">
    <parent link="world"/> <child link="arm1"/>
    <origin xyz="0 0 0" rpy="0 0 0"/> <axis xyz="0 0 1"/>
  </joint>
  <link name="arm1">
    <inertial>
      <origin rpy="0 0 0" xyz="0 {-L1} 0"/>
      <mass value="{M1}"/>
      <inertia ixx="0" ixy="0" ixz="0" iyy="0" iyz="0" izz="0"/>
    </inertial>
    <collision><geometry><mesh filename="tip.obj"/></geometry></collision>
  </link>
  <joint name="j2" type="revolute">
    <parent link="arm1"/> <child link="arm2"/>
    <origin xyz="0 {-L1} 0" rpy="0 0 0"/> <axis xyz="0 0 1"/>
  </joint>
  <link name="arm2">
    <inertial>
      <origin rpy="0 0 0" xyz="0 {-L2} 0"/>
      <mass value="{M2}"/>
      <inertia ixx="0" ixy="0" ixz="0" iyy="0" iyz="0" izz="0"/>
    </inertial>
    <collision><geometry><mesh filename="tip.obj"/></geometry></collision>
  </link>
  {branch_xml}
</robot>
""")
    return urdf


def test_urdf_chain_end_to_end(tmp_path):
    """URDF parse -> chain detection -> RigidModel.step must reproduce the
    textbook double-pendulum accelerations (same geometry and angle
    convention as _double_pendulum: hanging along -y at q=0, axis +z)."""
    from softmac_tpu.config.node import CN
    from softmac_tpu.engine.meshio import load_urdf
    from softmac_tpu.engine.rigid import RigidModel, RigidState

    cfg = CN()
    cfg.gravity = (0.0, -G, 0.0)
    cfg.init_state = (0.0, 0.0, 0.0, 0.0)
    cfg.enable_floor = False
    cfg.floor_height = -0.08
    cfg.floor_stiffness = 1e4
    cfg.floor_damping = 10.0
    cfg.ext_grad_scale = 1.0

    dt = 1e-4
    m = RigidModel([load_urdf(_pendulum_urdf(tmp_path))], cfg, env_dt=dt,
                   dtype=jnp.float64)
    assert len(m._chains) == 1
    assert [b.jtype for b in m.bodies] == ["chain", "chain"]

    rng = np.random.RandomState(1)
    for _ in range(4):
        q = rng.uniform(-2.0, 2.0, 2)
        qd = rng.uniform(-3.0, 3.0, 2)
        s = RigidState(q=jnp.asarray(q), qd=jnp.asarray(qd))
        s2 = m.step(s, None, jnp.zeros((2, 6), jnp.float64))
        b = np.asarray((s2.qd - s.qd) / dt)          # relative qdd
        th = np.array([q[0], q[0] + q[1]])           # absolute angles
        thd = np.array([qd[0], qd[0] + qd[1]])
        a = _oracle_qdd(th, thd)
        np.testing.assert_allclose([b[0], b[0] + b[1]], a,
                                   rtol=1e-7, atol=1e-7)

    # FK through body_states: link-2 joint origin hangs at the end of arm 1
    q = jnp.asarray([0.4, -0.9], jnp.float64)
    bs = m.body_states(RigidState(q=q, qd=jnp.zeros(2, jnp.float64)))
    c1 = np.array([np.sin(0.4) * L1, -np.cos(0.4) * L1, 0.0])
    np.testing.assert_allclose(np.asarray(bs.pos[0]), np.zeros(3), atol=1e-12)
    np.testing.assert_allclose(np.asarray(bs.pos[1]), c1, atol=1e-12)

    # action routing: equal-and-opposite check — a torque on joint 2 at rest
    # accelerates joint 2 and back-drives joint 1 per the coupled M(q)
    s = RigidState(q=jnp.zeros(2, jnp.float64), qd=jnp.zeros(2, jnp.float64))
    s2 = m.step(s, jnp.asarray([0.0, 1e-3], jnp.float64),
                jnp.zeros((2, 6), jnp.float64))
    Mq = np.array([[(M1 + M2) * L1 ** 2 + M2 * L2 * (L2 + 2 * L1)
                    , M2 * L2 * (L2 + L1)],
                   [M2 * L2 * (L2 + L1), M2 * L2 ** 2]])
    qdd = np.linalg.solve(Mq, [0.0, 1e-3])
    np.testing.assert_allclose(np.asarray(s2.qd) / dt, qdd, rtol=1e-6)


def test_urdf_branching_tree_detection(tmp_path):
    """A Y-shaped URDF (two links hanging from arm1's tip) is detected as
    ONE tree with BFS parents [-1, 0, 0]; hanging equilibrium is stationary."""
    from softmac_tpu.config.node import CN
    from softmac_tpu.engine.meshio import load_urdf
    from softmac_tpu.engine.rigid import RigidModel, RigidState

    cfg = CN()
    cfg.gravity = (0.0, -G, 0.0)
    cfg.init_state = (0.0,) * 6
    cfg.enable_floor = False
    cfg.floor_height = -0.08
    cfg.floor_stiffness = 1e4
    cfg.floor_damping = 10.0
    cfg.ext_grad_scale = 1.0

    m = RigidModel([load_urdf(_pendulum_urdf(tmp_path, branch=True))], cfg,
                   env_dt=1e-4, dtype=jnp.float64)
    assert len(m._chains) == 1
    assert m._chains[0]["chain"].parents == [-1, 0, 0]
    assert [b.jtype for b in m.bodies] == ["chain"] * 3

    s = RigidState(q=jnp.zeros(3, jnp.float64), qd=jnp.zeros(3, jnp.float64))
    s2 = m.step(s, None, jnp.zeros((3, 6), jnp.float64))
    np.testing.assert_allclose(np.asarray(s2.qd), 0.0, atol=1e-12)

    # a torque on branch arm3 back-drives the root but NOT branch arm2
    # (M has no 2-3 coupling; C, G vanish at rest)
    s2 = m.step(s, jnp.asarray([0.0, 0.0, 1e-3], jnp.float64),
                jnp.zeros((3, 6), jnp.float64))
    qdd = np.asarray(s2.qd) / 1e-4
    th_dd = np.array([qdd[0], qdd[0] + qdd[1], qdd[0] + qdd[2]])
    m3, L3 = 0.4, 0.35
    Mq = np.array([[(M1 + M2 + m3) * L1 ** 2, M2 * L1 * L2, m3 * L1 * L3],
                   [M2 * L1 * L2, M2 * L2 ** 2, 0.0],
                   [m3 * L1 * L3, 0.0, m3 * L3 ** 2]])
    # generalized force in ABSOLUTE coords for a pure joint-3 torque:
    # tau_abs = J^{-T} tau_rel with th = [q1, q1+q2, q1+q3]
    J = np.array([[1.0, 0, 0], [1, 1, 0], [1, 0, 1]])
    tau_abs = np.linalg.solve(J.T, [0.0, 0.0, 1e-3])
    np.testing.assert_allclose(th_dd, np.linalg.solve(Mq, tau_abs),
                               rtol=1e-6)


def test_gradients_through_step_match_finite_differences():
    """The rollout differentiates chain.step (M from jax.hessian inside the
    step means grad-of-step is third-order AD): check d loss / d tau over a
    short horizon against central finite differences."""
    chain = _double_pendulum()

    def loss(tau):
        q = jnp.asarray([0.3, -0.2], jnp.float64)
        qd = jnp.asarray([0.5, 0.1], jnp.float64)
        wr = jnp.zeros((2, 6), jnp.float64)
        for _ in range(5):
            q, qd = chain.step(q, qd, tau, wr)
        return jnp.sum(q ** 2) + 0.1 * jnp.sum(qd ** 2)

    tau0 = jnp.asarray([0.2, -0.4], jnp.float64)
    g = np.asarray(jax.jit(jax.grad(loss))(tau0))
    eps = 1e-6
    for i in range(2):
        e = np.zeros(2)
        e[i] = eps
        fd = (float(loss(tau0 + e)) - float(loss(tau0 - e))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=1e-5)


def _arm_obj(tmp_path, L=0.16, half=0.02):
    """Arm collision mesh: box spanning y in [-L, 0] (link frame)."""
    obj = tmp_path / "arm.obj"
    xs, zs = (-half, half), (-half, half)
    verts = [(x, y, z) for x in xs for y in (-L, 0.0) for z in zs]
    lines = [f"v {x} {y} {z}" for x, y, z in verts]
    lines += ["f 1 2 4 3", "f 5 7 8 6", "f 1 5 6 2",
              "f 3 4 8 7", "f 1 3 7 5", "f 2 6 8 4"]
    obj.write_text("\n".join(lines) + "\n")
    return obj


def build_chain_env(tmp_path, n_particles=1200):
    """Small env whose rigid primitive is an articulated double pendulum
    (used here and by the sharding equivalence tests)."""
    from softmac_tpu import SoftMacEnv, get_cfg_defaults
    from softmac_tpu.config.node import CN

    _arm_obj(tmp_path)
    L, m_arm = 0.16, 0.2
    izz = m_arm * L * L / 12
    urdf = tmp_path / "pend_env.urdf"
    urdf.write_text(f"""<?xml version="1.0"?>
<robot name="pend_env">
  <link name="world"/>
  <joint name="j1" type="revolute">
    <parent link="world"/> <child link="arm1"/>
    <origin xyz="0.5 0.7 0.5" rpy="0 0 0"/> <axis xyz="0 0 1"/>
  </joint>
  <link name="arm1">
    <inertial>
      <origin rpy="0 0 0" xyz="0 {-L / 2} 0"/>
      <mass value="{m_arm}"/>
      <inertia ixx="{izz}" ixy="0" ixz="0" iyy="1e-5" iyz="0" izz="{izz}"/>
    </inertial>
    <collision><geometry><mesh filename="arm.obj"/></geometry></collision>
  </link>
  <joint name="j2" type="revolute">
    <parent link="arm1"/> <child link="arm2"/>
    <origin xyz="0 {-L} 0" rpy="0 0 0"/> <axis xyz="0 0 1"/>
  </joint>
  <link name="arm2">
    <inertial>
      <origin rpy="0 0 0" xyz="0 {-L / 2} 0"/>
      <mass value="{m_arm}"/>
      <inertia ixx="{izz}" ixy="0" ixz="0" iyy="1e-5" iyz="0" izz="{izz}"/>
    </inertial>
    <collision><geometry><mesh filename="arm.obj"/></geometry></collision>
  </link>
</robot>
""")

    cfg = get_cfg_defaults()
    cfg.control_mode = "rigid"
    cfg.env_dt = 1e-3
    cfg.SIMULATOR.dt = 1e-3
    cfg.SIMULATOR.E = 50.0
    cfg.SIMULATOR.ptype = 1            # elastic
    cfg.SIMULATOR.material_model = 0   # corotated
    cfg.SIMULATOR.ground_friction = 0.0
    cfg.SIMULATOR.collision_type = 2   # mixed / forecast
    cfg.SHAPES = [{
        "shape": "box", "width": (0.06, 0.08, 0.06),
        "init_pos": [0.60, 0.47, 0.5], "n_particles": n_particles,
        "color": 0, "init_rot": None,
    }]
    prim = CN()
    prim.friction = 0.1
    prim.urdf_path = str(urdf)
    prim.enable_external_force = True
    cfg.PRIMITIVES = [prim]
    cfg.RIGID.gravity = (0.0, -9.8, 0.0)
    cfg.RIGID.enable_floor = False
    cfg.RIGID.init_state = (1.2, 0.0, 0.0, 0.0)
    cfg.TPU.active_window = (24, 24, 16)

    return SoftMacEnv(cfg, loss=False)


def test_env_chain_contact_coupling(tmp_path):
    """Full-stack two-way coupling with an articulated double pendulum as
    the scene's rigid primitive: URDF -> SDF bake -> jitted env steps. The
    swinging arm must push the particle blob (forward coupling) and the
    reaction wrench must slow the swing vs the free pendulum (reverse
    coupling through RigidModel.step -> ArticulatedTree.step)."""
    env = build_chain_env(tmp_path)
    assert env.n_primitives == 2
    assert len(env.rigid_model._chains) == 1
    assert [b.jtype for b in env.rigid_model.bodies] == ["chain", "chain"]

    x0 = np.asarray(env.init_particles)
    env.reset()
    max_wrench = 0.0
    for _ in range(250):
        env.step(None)
        max_wrench = max(max_wrench,
                         float(jnp.max(jnp.abs(env.last_ext_f))))
    mpm, bodies, rigid = env._carry

    # everything finite after 250 coupled steps
    assert np.isfinite(np.asarray(rigid.q)).all()
    for c in range(3):
        assert np.isfinite(np.asarray(mpm.x[c])).all()

    # forward coupling: the arm plowed through the blob
    x_fin = np.stack([np.asarray(mpm.x[c]) for c in range(3)], -1)
    assert max_wrench > 1e-4
    assert float(np.max(np.linalg.norm(x_fin - x0, axis=-1))) > 0.01

    # reverse coupling: the swing lost speed vs the free pendulum
    free = env.rigid_model.init_state()
    zero_ext = jnp.zeros((2, 6), env.dtype)
    step_free = jax.jit(lambda s: env.rigid_model.step(s, None, zero_ext))
    for _ in range(250):
        free = step_free(free)
    assert np.isfinite(np.asarray(free.q)).all()
    assert abs(float(rigid.qd[0])) < abs(float(free.qd[0])) - 1e-3 or \
        abs(float(rigid.q[0] - free.q[0])) > 1e-3


def test_floating_joint_exact_cases():
    """Floating (6-DoF chart) joint in the tree: ballistic translation and
    principal-axis spin are EXACT for semi-implicit Euler (the chart
    coincides with the world coords in both cases)."""
    from softmac_tpu.engine.chain import ArticulatedTree
    mass, I3 = 0.4, np.diag([2e-3, 3e-3, 4e-3])
    j = ChainJoint(jtype="floating", origin_pos=np.zeros(3),
                   origin_rot=np.eye(3), axis=np.array([0.0, 0, 1]),
                   mass=mass, inertia=I3, com=np.zeros(3))
    dt = 1e-3
    tree = ArticulatedTree([j], base_pos=np.zeros(3), base_rot=np.eye(3),
                           gravity=(0.0, -G, 0.0), dt=dt, dtype=jnp.float64)
    assert tree.n_dof == 6

    # ballistic: y(T) = -g dt^2 T(T+1)/2 (matches the closed-form fast path)
    q = jnp.zeros(6, jnp.float64)
    qd = jnp.zeros(6, jnp.float64)
    tau = jnp.zeros(6, jnp.float64)
    wr = jnp.zeros((1, 6), jnp.float64)
    step = jax.jit(lambda q, qd: tree.step(q, qd, tau, wr))
    T = 50
    for _ in range(T):
        q, qd = step(q, qd)
    np.testing.assert_allclose(float(q[4]), -G * dt * dt * T * (T + 1) / 2,
                               atol=1e-10)
    np.testing.assert_allclose(float(qd[4]), -G * dt * T, atol=1e-10)
    np.testing.assert_allclose(np.asarray(qd[:3]), 0.0, atol=1e-12)

    # principal-axis spin under a constant world torque (zero gravity)
    tree_g0 = ArticulatedTree([j], base_pos=np.zeros(3), base_rot=np.eye(3),
                              gravity=(0.0, 0.0, 0.0), dt=dt,
                              dtype=jnp.float64)
    wr_t = jnp.zeros((1, 6), jnp.float64).at[0, 5].set(1e-3)  # torque z
    q = jnp.zeros(6, jnp.float64)
    qd = jnp.zeros(6, jnp.float64)
    step = jax.jit(lambda q, qd: tree_g0.step(q, qd, tau, wr_t))
    for _ in range(20):
        q, qd = step(q, qd)
    np.testing.assert_allclose(float(qd[2]), 1e-3 / I3[2, 2] * dt * 20,
                               rtol=1e-9)


def test_floating_base_momentum_conservation():
    """Free-flying assembly (floating box + revolute arm), zero gravity:
    internal joint actuation must not move the COM or create net linear
    momentum (Newton's third law through the chart's J^T routing)."""
    from softmac_tpu.engine.chain import ArticulatedTree
    mb, ma, L = 0.5, 0.2, 0.3
    base = ChainJoint(jtype="floating", origin_pos=np.zeros(3),
                      origin_rot=np.eye(3), axis=np.array([0.0, 0, 1]),
                      mass=mb, inertia=np.diag([1e-3] * 3), com=np.zeros(3))
    arm = ChainJoint(jtype="revolute", origin_pos=np.array([0.1, 0.0, 0.0]),
                     origin_rot=np.eye(3), axis=np.array([0.0, 0, 1]),
                     mass=ma, inertia=np.diag([1e-4] * 3),
                     com=np.array([0.0, -L, 0.0]))
    dt = 1e-4
    tree = ArticulatedTree([base, arm], base_pos=np.zeros(3),
                           base_rot=np.eye(3), gravity=(0.0, 0.0, 0.0),
                           dt=dt, dtype=jnp.float64, parents=[-1, 0])

    def com_and_momentum(q, qd):
        p, R = tree.fk(q)
        w, v = tree.link_velocities(q, qd)
        mom, com, mt = jnp.zeros(3), jnp.zeros(3), 0.0
        for i, j in enumerate(tree.joints):
            cw = p[i] + R[i] @ jnp.asarray(j.com, q.dtype)
            vcw = v[i] + jnp.cross(w[i], R[i] @ jnp.asarray(j.com, q.dtype))
            mom = mom + j.mass * vcw
            com = com + j.mass * cw
            mt += j.mass
        return com / mt, mom

    q = jnp.zeros(7, jnp.float64).at[6].set(0.4)   # arm angle 0.4
    qd = jnp.zeros(7, jnp.float64)
    com0, _ = com_and_momentum(q, qd)
    tau = jnp.zeros(7, jnp.float64).at[6].set(2e-3)  # internal actuation
    wr = jnp.zeros((2, 6), jnp.float64)
    step = jax.jit(lambda q, qd: tree.step(q, qd, tau, wr))
    for _ in range(1000):
        q, qd = step(q, qd)
    com1, mom1 = com_and_momentum(q, qd)
    # the arm is clearly swinging...
    assert abs(float(qd[6])) > 0.05
    # ...but the COM stays put and net momentum stays ~0
    scale = (mb + ma) * L
    assert float(jnp.linalg.norm(com1 - com0)) < 1e-5
    assert float(jnp.linalg.norm(mom1)) / scale < 1e-3


def test_gradients_through_floating_base_match_finite_differences():
    """d loss / d wrench through multiple floating-base steps (incl. the
    chart re-centering jvp) vs central finite differences."""
    from softmac_tpu.engine.chain import ArticulatedTree
    base = ChainJoint(jtype="floating", origin_pos=np.zeros(3),
                      origin_rot=np.eye(3), axis=np.array([0.0, 0, 1]),
                      mass=0.5, inertia=np.diag([1e-3] * 3),
                      com=np.array([0.02, 0.0, 0.0]))
    arm = ChainJoint(jtype="revolute", origin_pos=np.array([0.1, 0.0, 0.0]),
                     origin_rot=np.eye(3), axis=np.array([0.0, 0, 1]),
                     mass=0.2, inertia=np.diag([1e-4] * 3),
                     com=np.array([0.0, -0.3, 0.0]))
    tree = ArticulatedTree([base, arm], base_pos=np.zeros(3),
                           base_rot=np.eye(3), gravity=(0.0, -G, 0.0),
                           dt=1e-3, dtype=jnp.float64, parents=[-1, 0])

    def loss(wr_base):
        q = jnp.zeros(7, jnp.float64).at[6].set(0.5)
        qd = jnp.zeros(7, jnp.float64).at[2].set(0.8)
        tau = jnp.zeros(7, jnp.float64)
        wr = jnp.zeros((2, 6), jnp.float64).at[0].set(wr_base)
        for _ in range(4):
            q, qd = tree.step(q, qd, tau, wr)
        return jnp.sum(q ** 2) + 0.1 * jnp.sum(qd ** 2)

    wr0 = jnp.asarray([0.3, -0.2, 0.1, 0.05, -0.03, 0.02], jnp.float64)
    g = np.asarray(jax.jit(jax.grad(loss))(wr0))
    eps = 1e-6
    for i in range(6):
        e = np.zeros(6)
        e[i] = eps
        fd = (float(loss(wr0 + e)) - float(loss(wr0 - e))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-5, atol=1e-10)


def _flybot_urdf(tmp_path):
    """Floating base link carrying a revolute arm."""
    obj = tmp_path / "tip.obj"
    lo, hi = -0.01, 0.01
    verts = [(x, y, z) for x in (lo, hi) for y in (lo, hi) for z in (lo, hi)]
    lines = [f"v {x} {y} {z}" for x, y, z in verts]
    lines += ["f 1 2 4 3", "f 5 7 8 6", "f 1 5 6 2",
              "f 3 4 8 7", "f 1 3 7 5", "f 2 6 8 4"]
    obj.write_text("\n".join(lines) + "\n")
    urdf = tmp_path / "flybot.urdf"
    urdf.write_text(f"""<?xml version="1.0"?>
<robot name="flybot">
  <link name="world"/>
  <joint name="root" type="floating">
    <parent link="world"/> <child link="body"/>
    <origin xyz="0.5 0.5 0.5" rpy="0 0 0"/>
  </joint>
  <link name="body">
    <inertial>
      <origin rpy="0 0 0" xyz="0 0 0"/>
      <mass value="0.5"/>
      <inertia ixx="1e-3" ixy="0" ixz="0" iyy="1e-3" iyz="0" izz="1e-3"/>
    </inertial>
    <collision><geometry><mesh filename="tip.obj"/></geometry></collision>
  </link>
  <joint name="shoulder" type="revolute">
    <parent link="body"/> <child link="arm"/>
    <origin xyz="0.05 0 0" rpy="0 0 0"/> <axis xyz="0 0 1"/>
  </joint>
  <link name="arm">
    <inertial>
      <origin rpy="0 0 0" xyz="0 -0.2 0"/>
      <mass value="0.2"/>
      <inertia ixx="1e-4" ixy="0" ixz="0" iyy="1e-4" iyz="0" izz="1e-4"/>
    </inertial>
    <collision><geometry><mesh filename="tip.obj"/></geometry></collision>
  </link>
</robot>
""")
    return urdf


def _flybot_cfg(init_state, enable_floor=False):
    from softmac_tpu.config.node import CN
    cfg = CN()
    cfg.gravity = (0.0, -G, 0.0)
    cfg.init_state = init_state
    cfg.enable_floor = enable_floor
    cfg.floor_height = -0.08
    cfg.floor_stiffness = 1e4
    cfg.floor_damping = 10.0
    cfg.ext_grad_scale = 1.0
    return cfg


def test_urdf_floating_base_tree(tmp_path):
    """URDF with a floating base link carrying a revolute arm: detected as
    one 7-dof tree; started with internal spin, the COM still free-falls
    ballistically (internal dynamics cannot move the COM)."""
    from softmac_tpu.engine.meshio import load_urdf
    from softmac_tpu.engine.rigid import RigidModel, RigidState

    urdf = _flybot_urdf(tmp_path)
    # free-joint q is the WORLD pose (the URDF <origin> is ignored, same as
    # the fast path): place the base explicitly
    cfg = _flybot_cfg((0.0, 0.0, 0.0, 0.5, 0.5, 0.5, 0.8)
                      + (0.0,) * 6 + (2.0,))

    dt = 1e-4
    m = RigidModel([load_urdf(urdf)], cfg, env_dt=dt, dtype=jnp.float64)
    assert len(m._chains) == 1
    assert m._chains[0]["chain"].n_dof == 7
    assert m.action_dim == 7

    tree = m._chains[0]["chain"]
    s = m.init_state()

    def com_of(q):
        p, R = tree.fk(q)
        num, mt = jnp.zeros(3), 0.0
        for i, j in enumerate(tree.joints):
            num = num + j.mass * (p[i] + R[i] @ jnp.asarray(j.com, q.dtype))
            mt += j.mass
        return num / mt, mt

    # initial COM velocity from the initial arm spin (total momentum / mass)
    com0, m_tot = com_of(s.q)
    com0 = np.asarray(com0)
    _, v_com0 = jax.jvp(lambda q: com_of(q)[0], (s.q,), (s.qd,))
    v_com0 = np.asarray(v_com0)

    step = jax.jit(lambda s: m.step(s, None, jnp.zeros((2, 6), jnp.float64)))
    T = 400
    import jax.lax as lax
    s = lax.fori_loop(0, T, lambda i, s: step(s), s)
    assert np.isfinite(np.asarray(s.q)).all()
    # internal state clearly evolved (arm spins, base counter-rotates)...
    assert abs(float(s.q[6] - 0.8)) > 0.05
    assert abs(float(s.qd[2])) > 1e-4
    # ...while the COM translates ballistically: uniform velocity from the
    # initial spin in x/z, quadratic free fall in y — internal dynamics
    # cannot change total momentum
    com1 = np.asarray(com_of(s.q)[0])
    horizon = dt * T
    np.testing.assert_allclose(com1[0], com0[0] + v_com0[0] * horizon,
                               atol=5e-5)
    np.testing.assert_allclose(com1[2], com0[2] + v_com0[2] * horizon,
                               atol=5e-5)
    y_expect = com0[1] + v_com0[1] * horizon - G * dt * dt * T * (T + 1) / 2
    np.testing.assert_allclose(com1[1], y_expect, atol=5e-4)


def test_vmap_through_tree_env_step(tmp_path):
    """Batched rollouts / replica robustification vmap the env step; the
    tree solver (hessian + linalg.solve inside) must be vmap-clean and
    replica 0 must match the unbatched step exactly."""
    env = build_chain_env(tmp_path, n_particles=256)
    c0 = env._initial_carry()
    B = 3
    carry = jax.tree.map(
        lambda s: jnp.broadcast_to(s[None], (B,) + s.shape), c0)
    rng = np.random.RandomState(0)
    noise = rng.randn(B, *np.shape(c0[0].x)) * 1e-4
    noise[0] = 0.0
    mpm = carry[0].replace(x=carry[0].x + jnp.asarray(noise, env.dtype))
    carry = (mpm,) + tuple(carry[1:])
    actions = jnp.zeros((B, env.action_dim), env.dtype)

    step_b = jax.jit(jax.vmap(lambda c, a: env._env_step_fn(c, a)[0]))
    out = step_b(carry, actions)   # leaves gain a leading replica axis
    ref = jax.jit(lambda c, a: env._env_step_fn(c, a)[0])(c0, actions[0])

    assert np.isfinite(np.asarray(out[0].x)).all()
    np.testing.assert_allclose(np.asarray(out[0].x[0]),
                               np.asarray(ref[0].x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(out[2].q[0]),
                               np.asarray(ref[2].q), atol=1e-12)
    # jittered replicas actually diverge from replica 0
    assert float(jnp.max(jnp.abs(out[0].x[1] - out[0].x[0]))) > 0


def test_body_states_convention():
    """body_states must return BODY-frame COM spatial velocity (the contact
    collider rotates body->world): check against the world COM velocity from
    jvp of the COM position."""
    chain = _double_pendulum()
    q = jnp.asarray([0.7, -1.1], jnp.float64)
    qd = jnp.asarray([1.3, 0.4], jnp.float64)
    pos, quat, vb, wb = chain.body_states(q, qd)

    def com_w(q_):
        p, R = chain.fk(q_)
        return jnp.stack([p[i] + R[i] @ jnp.asarray(chain.joints[i].com,
                                                    q_.dtype)
                          for i in range(2)])

    _, v_com_w = jax.jvp(com_w, (q,), (qd,))
    from softmac_tpu.engine import quat as Q
    for i in range(2):
        got = Q.qrot(quat[i], vb[i])   # body -> world (collider convention)
        np.testing.assert_allclose(np.asarray(got), np.asarray(v_com_w[i]),
                                   atol=1e-12)


def test_floating_chain_floor_penalty(tmp_path):
    """A free-flying articulated assembly dropped above the floor must NOT
    fall through it when RIGID.enable_floor is on (the floor wrench routes
    through the tree's wrench rows)."""
    from softmac_tpu.engine.meshio import load_urdf
    from softmac_tpu.engine.rigid import RigidModel

    urdf = _flybot_urdf(tmp_path)
    cfg = _flybot_cfg((0.0, 0.0, 0.0, 0.5, 0.0, 0.5, 0.05) + (0.0,) * 7,
                      enable_floor=True)
    m = RigidModel([load_urdf(urdf)], cfg, env_dt=1e-3, dtype=jnp.float64)
    m.floor_damping = 100.0
    s = m.init_state()
    step = jax.jit(lambda s: m.step(s, None, jnp.zeros((2, 6), jnp.float64)))
    import jax.lax as lax
    s = lax.fori_loop(0, 4000, lambda i, s: step(s), s)
    assert np.isfinite(np.asarray(s.q)).all()
    # the base's mesh bottom must rest near the floor plane, not below it
    bottom = float(s.q[4]) + m.bodies[0].support_points[:, 1].min()
    assert bottom > m.floor_height - 0.05, bottom
    assert abs(float(s.qd[4])) < 0.5


def test_adjust_action_holds_floating_chain(tmp_path):
    """adjust_action_with_ext_force must compensate gravity for a floating
    CHAIN root (carrying the whole assembly's weight), not just fast-path
    floating bodies: with the adjusted action the COM barely falls, without
    it the assembly free-falls."""
    from softmac_tpu import SoftMacEnv, get_cfg_defaults
    from softmac_tpu.config.node import CN

    _arm_obj(tmp_path)   # unused mesh, keeps tmp layout uniform
    urdf = _flybot_urdf(tmp_path)

    cfg = get_cfg_defaults()
    cfg.control_mode = "rigid"
    cfg.env_dt = 1e-3
    cfg.SIMULATOR.dt = 1e-3
    cfg.SIMULATOR.ptype = 1
    cfg.SIMULATOR.material_model = 0
    cfg.SIMULATOR.E = 50.0
    cfg.SIMULATOR.collision_type = 2
    # tiny blob far from the assembly: no contact, pure gravity test
    cfg.SHAPES = [{"shape": "box", "width": (0.04, 0.04, 0.04),
                   "init_pos": [0.15, 0.8, 0.15], "n_particles": 64,
                   "color": 0, "init_rot": None}]
    prim = CN()
    prim.friction = 0.1
    prim.urdf_path = str(urdf)
    prim.enable_external_force = True
    cfg.PRIMITIVES = [prim]
    cfg.RIGID.gravity = (0.0, -G, 0.0)
    cfg.RIGID.enable_floor = False
    cfg.RIGID.init_state = (0.0, 0.0, 0.0, 0.5, 0.5, 0.5, 0.0) + (0.0,) * 7
    cfg.TPU.active_window = (16, 16, 16)

    env = SoftMacEnv(cfg, loss=False)
    T = 20
    actions = np.zeros((T, env.action_dim))
    adj = env.adjust_action_with_ext_force(actions)
    # base force rows compensate the TOTAL assembly weight (0.5 + 0.2)
    np.testing.assert_allclose(adj[:, 4], 0.7 * G, rtol=1e-6)

    env.reset()
    for a in adj:
        env.step(a)
    y_held = float(env._carry[2].q[4])
    env.reset()
    for a in actions:
        env.step(a)
    y_free = float(env._carry[2].q[4])
    # compensation holds the assembly (small residual motion remains: the
    # force acts at the base origin, so it exerts torque about the COM —
    # identical behavior to the fast path's free-body compensation)
    drop_free = abs(y_free - 0.5)
    assert drop_free > 1e-3                   # free-fell without adjustment
    assert abs(y_held - 0.5) < 0.25 * drop_free


def test_compensation_mass_subtree(tmp_path):
    """RigidModel.compensation_mass: a floating chain root holds its whole
    subtree's gravity-on mass; masking a member via ext_force_flags removes
    its weight (matching the chain's PE mask); non-free joints return None."""
    from softmac_tpu.engine.meshio import load_urdf
    from softmac_tpu.engine.rigid import RigidModel

    urdf = _flybot_urdf(tmp_path)
    cfg = _flybot_cfg((0.0,) * 14)
    m = RigidModel([load_urdf(urdf)], cfg, env_dt=1e-3, dtype=jnp.float64)
    assert m.bodies[0].jtype == "chain"
    np.testing.assert_allclose(m.compensation_mass(0), 0.7)
    assert m.compensation_mass(1) is None        # revolute member

    m2 = RigidModel([load_urdf(urdf)], cfg, env_dt=1e-3, dtype=jnp.float64,
                    ext_force_flags=(True, False))
    np.testing.assert_allclose(m2.compensation_mass(0), 0.5)
