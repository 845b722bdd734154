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
