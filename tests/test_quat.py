import jax.numpy as jnp
import numpy as np

from softmac_tpu.engine import quat


def random_quats(n, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, 4)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_qrot_matches_matrix():
    q = jnp.asarray(random_quats(32))
    v = jnp.asarray(np.random.RandomState(1).randn(32, 3))
    r = quat.quat2mat(q)
    expected = jnp.einsum("nij,nj->ni", r, v)
    np.testing.assert_allclose(quat.qrot(q, v), expected, atol=1e-12)


def test_qmul_identity_and_inverse():
    q = jnp.asarray(random_quats(16))
    ident = jnp.zeros((16, 4)).at[:, 0].set(1.0)
    np.testing.assert_allclose(quat.qmul(q, ident), q, atol=1e-12)
    qq = quat.qmul(q, quat.qconj(q))
    np.testing.assert_allclose(qq, ident, atol=1e-10)


def test_w2quat_roundtrip():
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.randn(64, 3) * 0.5)
    q = quat.w2quat(w)
    np.testing.assert_allclose(quat.quat2w(q), w, atol=1e-6)
    # zero rotation is safe
    q0 = quat.w2quat(jnp.zeros((4, 3)))
    np.testing.assert_allclose(q0[:, 0], 1.0, atol=1e-6)


def test_mat2quat_roundtrip():
    q = jnp.asarray(random_quats(64, seed=3))
    m = quat.quat2mat(q)
    q2 = quat.mat2quat(m)
    # quaternion double cover: compare up to sign
    sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-8)


def test_inv_trans():
    q = jnp.asarray(random_quats(8, seed=4))
    pos = jnp.asarray(np.random.RandomState(5).randn(8, 3))
    p_local = jnp.asarray(np.random.RandomState(6).randn(8, 3))
    p_world = quat.qrot(q, p_local) + pos
    np.testing.assert_allclose(quat.inv_trans(p_world, pos, q), p_local, atol=1e-10)


def test_rpy2mat():
    m = quat.rpy2mat((0.0, 0.0, 0.0))
    np.testing.assert_allclose(m, np.eye(3), atol=1e-12)
    m = quat.rpy2mat((0.0, 0.0, np.pi / 2))
    np.testing.assert_allclose(m @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-12)
