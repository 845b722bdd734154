"""Pallas KR-build kernel vs the XLA reference build (interpret mode on CPU:
same kernel logic, no TPU required), including the custom-VJP backward
against autodiff of the XLA formulation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from softmac_tpu.ops import pallas_kr


def xla_kr3(Wy, Wz, WDy, WDz):
    wy, wz = Wy.shape[0], Wz.shape[0]

    def pair(a, b):
        return (a[:, None, :] * b[None, :, :]).reshape(wy * wz, -1)

    return pair(Wy, Wz), pair(WDy, Wz), pair(Wy, WDz)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pallas_kr, "_INTERPRET", True)
    monkeypatch.setattr(pallas_kr, "_TILE_N", 128)


def _inputs(wy=8, wz=16, n=300, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda r: jnp.asarray(rng.rand(r, n), jnp.float32)
    return mk(wy), mk(wz), mk(wy), mk(wz)


def test_kr3_forward_matches_xla():
    args = _inputs()
    out_k = pallas_kr.kr3(*args)
    out_x = xla_kr3(*args)
    for k, x in zip(out_k, out_x):
        np.testing.assert_allclose(np.asarray(k), np.asarray(x), atol=0)


def test_kr3_vjp_matches_autodiff():
    args = _inputs(seed=1)

    def loss_k(*a):
        H, HDy, HDz = pallas_kr.kr3(*a)
        return jnp.sum(H * H) + jnp.sum(HDy) + jnp.sum(HDz * HDz * 0.5)

    def loss_x(*a):
        H, HDy, HDz = xla_kr3(*a)
        return jnp.sum(H * H) + jnp.sum(HDy) + jnp.sum(HDz * HDz * 0.5)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(*args)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
