import jax
import jax.numpy as jnp
import numpy as np

from softmac_tpu.engine.svd3 import svd3


def random_F(n, seed=0, scale=0.3):
    rng = np.random.RandomState(seed)
    return jnp.asarray(np.eye(3) + scale * rng.randn(n, 3, 3))


def check_decomposition(F, U, sig, V, atol=1e-8):
    n = F.shape[0]
    sig_mat = jax.vmap(jnp.diag)(sig)
    recon = U @ sig_mat @ jnp.swapaxes(V, -1, -2)
    np.testing.assert_allclose(recon, F, atol=atol)
    eye = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))
    np.testing.assert_allclose(U @ jnp.swapaxes(U, -1, -2), eye, atol=atol)
    np.testing.assert_allclose(V @ jnp.swapaxes(V, -1, -2), eye, atol=atol)
    np.testing.assert_allclose(jnp.linalg.det(U), 1.0, atol=atol)
    np.testing.assert_allclose(jnp.linalg.det(V), 1.0, atol=atol)


def test_svd3_reconstruction():
    F = random_F(256)
    U, sig, V = svd3(F)
    check_decomposition(F, U, sig, V)
    # descending magnitude, last sigma carries det sign
    assert jnp.all(sig[:, 0] >= sig[:, 1] - 1e-9)
    assert jnp.all(sig[:, 1] >= sig[:, 2] - 1e-9)
    np.testing.assert_allclose(
        jnp.sign(sig[:, 2]) * jnp.abs(jnp.linalg.det(F)),
        jnp.linalg.det(F), atol=1e-8)


def test_svd3_negative_det():
    F = random_F(64, seed=1)
    F = F.at[:, :, 0].multiply(-1.0)  # reflections
    U, sig, V = svd3(F)
    check_decomposition(F, U, sig, V)
    assert jnp.all(sig[:, 2] <= 1e-9)


def test_svd3_identity_and_repeated_sigma():
    F = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
    U, sig, V = svd3(F)
    check_decomposition(F, U, sig, V)
    np.testing.assert_allclose(sig, 1.0, atol=1e-12)
    # gradient must be finite at repeated singular values
    def loss(F):
        U, sig, V = svd3(F)
        R = U @ jnp.swapaxes(V, -1, -2)
        return jnp.sum(R * F) + jnp.sum(sig**2)
    g = jax.grad(loss)(F)
    assert jnp.all(jnp.isfinite(g))


def test_svd3_gradient_vs_fd():
    """Compare custom VJP with central finite differences on sigma and R=UV^T
    (the quantities the MPM stress actually consumes)."""
    rng = np.random.RandomState(7)
    F0 = np.eye(3) + 0.25 * rng.randn(3, 3)

    def loss(F):
        U, sig, V = svd3(F[None])
        R = U @ jnp.swapaxes(V, -1, -2)
        return jnp.sum(sig**3) + jnp.sum(R * jnp.asarray(rng_dir))

    rng_dir = rng.randn(1, 3, 3)
    g = jax.grad(loss)(jnp.asarray(F0))

    eps = 1e-6
    for i in range(3):
        for j in range(3):
            Fp = F0.copy(); Fp[i, j] += eps
            Fm = F0.copy(); Fm[i, j] -= eps
            fd = (loss(jnp.asarray(Fp)) - loss(jnp.asarray(Fm))) / (2 * eps)
            np.testing.assert_allclose(g[i, j], fd, rtol=1e-4, atol=1e-6)


def test_svd3_large_batch_jit():
    F = random_F(10000, seed=3)
    U, sig, V = jax.jit(svd3)(F)
    sig_mat = jax.vmap(jnp.diag)(sig)
    recon = U @ sig_mat @ jnp.swapaxes(V, -1, -2)
    np.testing.assert_allclose(recon, F, atol=1e-7)
