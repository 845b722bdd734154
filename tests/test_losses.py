import jax
import jax.numpy as jnp
import numpy as np

from softmac_tpu.engine.losses.common import chamfer, pairwise_sqdist


def naive_chamfer(a, b):
    d2 = jnp.maximum(pairwise_sqdist(a, b), 0.0)
    return jnp.sum(jnp.min(d2, axis=1)) + jnp.sum(jnp.min(d2, axis=0))


def test_chamfer_value_and_grad_match_autodiff():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(300, 3))
    b = jnp.asarray(rng.rand(250, 3))
    np.testing.assert_allclose(float(chamfer(a, b)), float(naive_chamfer(a, b)),
                               rtol=1e-12)
    ga = jax.grad(chamfer, argnums=0)(a, b)
    ga_ref = jax.grad(naive_chamfer, argnums=0)(a, b)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_ref), atol=1e-12)
    gb = jax.grad(chamfer, argnums=1)(a, b)
    gb_ref = jax.grad(naive_chamfer, argnums=1)(a, b)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref), atol=1e-12)


def test_chamfer_zero_at_identity():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.rand(100, 3))
    assert float(chamfer(a, a)) < 1e-10
