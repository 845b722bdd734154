"""Unit tests for the taco demo driver pieces (no physics): the
delta-clamp projection geometry and the DeltaController lr plumbing
(regression for the baked-optax-lr bug — schedule and safeguard halving
must actually change the applied step)."""
import importlib
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "demos"))

demo_taco = importlib.import_module("demo_taco")


def test_clamp_delta_respects_reference_clamps():
    rng = np.random.RandomState(0)
    steps, dim, mpm_scale = 50, 8, 5.0
    actions_init = np.zeros((steps, dim))
    delta = rng.randn(steps, dim) * 0.05           # violates the 0.01 clamp
    clamped, absolute = demo_taco.clamp_delta(delta.copy(), actions_init,
                                              mpm_scale)
    assert np.abs(clamped).max() <= 0.01 + 1e-12
    assert np.allclose(clamped[0], 0.0)
    cs = np.cumsum(clamped, axis=0)
    r = 0.3 * mpm_scale
    assert np.abs(cs[:, 1]).max() <= r + 1e-9
    assert np.abs(cs[:, 4]).max() <= r + 1e-9
    # reachable-arc couplings (reference demo_taco.py:62-73)
    assert (cs[:, 0] <= np.sqrt(np.maximum(r**2 - cs[:, 1]**2, 0)) - r
            + 1e-9).all()
    assert (cs[:, 3] >= r - np.sqrt(np.maximum(r**2 - cs[:, 4]**2, 0))
            - 1e-9).all()
    # absolute = init + cumsum
    assert np.allclose(absolute, actions_init[0][None] + cs)
    # idempotent: re-projecting a projected trajectory changes nothing
    c2, a2 = demo_taco.clamp_delta(clamped.copy(), actions_init, mpm_scale)
    assert np.allclose(c2, clamped)
    assert np.allclose(a2, absolute)


def test_delta_controller_lr_actually_applies():
    steps, dim = 10, 8
    a0 = np.zeros((steps, dim))
    g = np.ones((steps, dim)) * 1e-3

    big = demo_taco.DeltaController(steps, a0, mpm_scale=5.0, lr=0.3,
                                    warmup=1, decay=1.0)
    big.step(g.copy())
    step_big = np.abs(big.get_actions() - a0).max()

    small = demo_taco.DeltaController(steps, a0, mpm_scale=5.0, lr=1e-4,
                                      warmup=1, decay=1.0)
    small.step(g.copy())
    step_small = np.abs(small.get_actions() - a0).max()

    # the big lr saturates the +-0.01 clamp, the small one must not —
    # with the baked-lr bug both came out identical
    assert step_big > step_small * 5
    assert step_small < 0.01

    # halving self.lr mid-run (the safeguard) changes the NEXT step
    c = demo_taco.DeltaController(steps, a0, mpm_scale=5.0, lr=1e-4,
                                  warmup=1, decay=1.0)
    c.step(g.copy())
    snap = c.snapshot()
    c.step(g.copy())
    after_full = c.get_actions().copy()
    c.restore(snap)
    c.lr *= 0.5
    c.step(g.copy())
    after_half = c.get_actions().copy()
    assert not np.allclose(after_full, after_half)


def test_controller_snapshot_restore_roundtrip():
    steps, dim = 10, 8
    a0 = np.zeros((steps, dim))
    rng = np.random.RandomState(1)
    c = demo_taco.DeltaController(steps, a0, mpm_scale=5.0, lr=0.05,
                                  warmup=1, decay=0.9)
    c.step(rng.randn(steps, dim))
    snap = c.snapshot()
    ref_actions = c.get_actions().copy()
    c.step(rng.randn(steps, dim))
    c.restore(snap)
    assert np.allclose(c.get_actions(), ref_actions)
    # identical gradient after restore -> identical re-step
    g2 = rng.randn(steps, dim)
    c.step(g2.copy())
    a_after = c.get_actions().copy()
    c.restore(snap)
    c.step(g2.copy())
    assert np.allclose(c.get_actions(), a_after)
