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


# ======================================================================
# Per-loss terms() pinned against hand-computed values (VERDICT r4 #4:
# every registry entry load-bearing, incl. the never-demoed Transport and
# Hang). References: softmac/engine/losses/loss_{pour,grip,door,transport}.py,
# soft_cloth/engine/losses/loss_{taco,hit,hang}.py.
# ======================================================================
import types

from softmac_tpu.engine.losses import (
    DoorLoss, FrameSample, GripLoss, HangLoss, HitLoss, LOSS_REGISTRY,
    PourLoss, TacoLoss, TransportLoss,
)
from softmac_tpu.engine.types import BodyState


class _CfgNode(dict):
    """Minimal attribute/get view of a loss cfg node."""
    __getattr__ = dict.__getitem__

    def get(self, k, default=None):
        return dict.get(self, k, default)


def _scene_stub(tmp_path, target=None):
    scene = types.SimpleNamespace(search_dirs=[str(tmp_path)],
                                  dtype=jnp.float64)
    if target is not None:
        np.save(tmp_path / "target.npy", target)
    return scene


def _bodies(pos, quat=None, v=None, w=None):
    n = len(pos)
    return BodyState(
        pos=jnp.asarray(pos, jnp.float64),
        quat=jnp.asarray(quat if quat is not None
                         else [[1.0, 0, 0, 0]] * n, jnp.float64),
        v=jnp.asarray(v if v is not None else np.zeros((n, 3)), jnp.float64),
        w=jnp.asarray(w if w is not None else np.zeros((n, 3)), jnp.float64))


def test_pour_loss_terms_hand_values(tmp_path):
    rng = np.random.RandomState(0)
    x = rng.rand(20, 3)
    tgt = rng.rand(15, 3)
    scene = _scene_stub(tmp_path, tgt)
    loss = PourLoss(_CfgNode(weight=(2.0, 3.0, 0.5),
                             target_path="target.npy"), scene)
    bodies = _bodies([[0.2, 0.55, 0.3]], v=[[1.0, -2.0, 0.5]],
                     w=[[0.1, 0.2, -0.3]])
    t = loss.terms(FrameSample(x=jnp.asarray(x), bodies=bodies))

    d2 = ((x[:, None] - tgt[None]) ** 2).sum(-1)
    exp_ch = 2.0 * (d2.min(1).sum() + d2.min(0).sum())
    np.testing.assert_allclose(float(t["chamfer_loss"]), exp_ch, rtol=1e-12)
    np.testing.assert_allclose(float(t["pose_loss"]),
                               3.0 * 10.0 * (0.55 - 0.4) ** 2, rtol=1e-12)
    np.testing.assert_allclose(
        float(t["vel_loss"]),
        0.5 * ((1 + 4 + 0.25) + 0.1 * (0.01 + 0.04 + 0.09)), rtol=1e-12)


def test_grip_loss_rotation_band_hand_values(tmp_path):
    tgt = np.zeros((4, 3))
    scene = _scene_stub(tmp_path, tgt)
    loss = GripLoss(_CfgNode(weight=(0.0, 1.0, 0.0),
                             target_path="target.npy"), scene)
    # qw = 0.3: below the 0.5 band -> (0.3-0.5)^2 penalty
    b = _bodies([[0.0, 0.4, 0.0]], quat=[[0.3, 0.954, 0, 0]])
    t = loss.terms(FrameSample(x=jnp.zeros((4, 3)), bodies=b))
    np.testing.assert_allclose(float(t["pose_loss"]), 0.04, rtol=1e-10)
    # qw = 0.95: above the 0.9 band -> (0.95-0.9)^2
    b = _bodies([[0.0, 0.4, 0.0]], quat=[[0.95, 0.312, 0, 0]])
    t = loss.terms(FrameSample(x=jnp.zeros((4, 3)), bodies=b))
    np.testing.assert_allclose(float(t["pose_loss"]), 0.0025, rtol=1e-9)
    # qw = 0.7: inside the band -> only the height pull remains (0 here)
    b = _bodies([[0.0, 0.4, 0.0]], quat=[[0.7, 0.714, 0, 0]])
    t = loss.terms(FrameSample(x=jnp.zeros((4, 3)), bodies=b))
    np.testing.assert_allclose(float(t["pose_loss"]), 0.0, atol=1e-14)


def test_door_loss_terms_hand_values(tmp_path):
    scene = _scene_stub(tmp_path)
    loss = DoorLoss(_CfgNode(weight=(1.0, 0.5, 2.0)), scene)
    x = np.array([[0.5, 0.5, 0.5], [0.3, 0.3, 0.3], [0.11, 0.1, 0.1]])
    b = _bodies([[0.1, 0.1, 0.1]], quat=[[0.9, 0.436, 0, 0]],
                v=[[0.2, 0.0, 0.0]])
    t = loss.terms(FrameSample(x=jnp.asarray(x), bodies=b))
    np.testing.assert_allclose(float(t["pose_loss"]),
                               (0.9 - np.cos(np.pi / 8)) ** 2, rtol=1e-12)
    np.testing.assert_allclose(float(t["vel_loss"]), 0.5 * 0.04, rtol=1e-12)
    d2 = ((x - np.array([0.1, 0.1, 0.1])) ** 2).sum(-1)
    exp = 2.0 * np.maximum(d2 - 0.01, 0.0).min() ** 2
    np.testing.assert_allclose(float(t["contact_loss"]), exp, rtol=1e-10)


def test_transport_loss_terms_hand_values(tmp_path):
    """TransportLoss (reference loss_transport.py:41-75): target-point pose,
    velocity, and per-controller-half min-contact-distance terms."""
    scene = _scene_stub(tmp_path)
    loss = TransportLoss(_CfgNode(weight=(1.0, 2.0, 3.0)), scene)
    x = np.array([[0.6, 0.4, 0.5],    # controller-1 half
                  [1.0, 1.0, 1.0],
                  [0.5, 0.6, 0.5],    # controller-2 half
                  [0.0, 0.0, 0.0]])
    b = _bodies([[0.55, 0.45, 0.5]], v=[[0.1, 0.2, 0.3]])
    t = loss.terms(FrameSample(x=jnp.asarray(x), bodies=b))
    exp_pose = ((0.55 - 0.5) ** 2 + (0.45 - 0.4) ** 2 + 0.0)
    np.testing.assert_allclose(float(t["pose_loss"]), 1.0 * exp_pose,
                               rtol=1e-12)
    np.testing.assert_allclose(float(t["vel_loss"]),
                               2.0 * (0.01 + 0.04 + 0.09), rtol=1e-12)
    d2 = ((x - np.array([0.55, 0.45, 0.5])) ** 2).sum(-1)
    m1 = np.maximum(d2[:2] - 0.01, 0.0).min()
    m2 = np.maximum(d2[2:] - 0.01, 0.0).min()
    np.testing.assert_allclose(float(t["contact_loss"]),
                               3.0 * (m1 ** 2 + m2 ** 2), rtol=1e-10)


def test_taco_hit_hang_loss_terms_hand_values(tmp_path):
    rng = np.random.RandomState(2)
    x = rng.rand(12, 3)
    cx = rng.rand(9, 3)
    cv = rng.rand(9, 3) * 0.1
    tgt = rng.rand(9, 3)
    scene = _scene_stub(tmp_path, tgt)

    taco = TacoLoss(_CfgNode(weight=(1.5,), target_path="target.npy"), scene)
    t = taco.terms(FrameSample(x=jnp.asarray(x), bodies=None))
    d2 = ((x[:, None] - tgt[None]) ** 2).sum(-1)
    np.testing.assert_allclose(float(t["chamfer_loss"]),
                               1.5 * (d2.min(1).sum() + d2.min(0).sum()),
                               rtol=1e-12)

    hit = HitLoss(_CfgNode(weight=(2.0,), target_path="target.npy"), scene)
    t = hit.terms(FrameSample(x=jnp.asarray(x), bodies=None,
                              cloth_x=jnp.asarray(cx)))
    np.testing.assert_allclose(float(t["pose_loss"]),
                               2.0 * ((cx - tgt) ** 2).sum(), rtol=1e-12)

    hang = HangLoss(_CfgNode(weight=(1.0, 0.25)), scene)
    hang.set_target(tgt)
    t = hang.terms(FrameSample(x=jnp.asarray(x), bodies=None,
                               cloth_x=jnp.asarray(cx), cloth_v=jnp.asarray(cv)))
    np.testing.assert_allclose(float(t["pose_loss"]),
                               ((cx - tgt) ** 2).sum(), rtol=1e-12)
    np.testing.assert_allclose(float(t["vel_loss"]),
                               0.25 * (cv ** 2).sum(), rtol=1e-12)


def test_registry_covers_all_reference_losses():
    assert set(LOSS_REGISTRY) == {
        "PourLoss", "GripLoss", "DoorLoss", "TransportLoss",
        "TacoLoss", "HangLoss", "HitLoss"}


def test_transport_loss_tiny_rollout_smoke():
    """TransportLoss driven end-to-end by a reduced two-body pour scene:
    finite loss terms + nonzero, finite action gradients (the registry
    entry is load-bearing, not just constructible)."""
    from softmac_tpu import SoftMacEnv, load
    from pathlib import Path
    root = Path(__file__).resolve().parents[1]
    cfg = load(str(root / "softmac_tpu/config/demo_pour_vel_config.py"))
    cfg.defrost()
    cfg.SHAPES = [{
        "shape": "box", "width": (0.15, 0.05, 0.15),
        "init_pos": [0.7, 0.32, 0.5], "n_particles": 256,
        "color": 0, "init_rot": None,
    }]
    cfg.ENV.loss_type = "TransportLoss"
    cfg.ENV.loss.weight = (1.0, 1.0, 1.0)
    cfg.freeze()
    env = SoftMacEnv(cfg, search_dirs=[str(root)])
    assert type(env.loss).__name__ == "TransportLoss"

    actions = np.zeros((2, env.action_dim))
    actions[:, 1] = 0.5
    out = env.rollout_and_grad(actions, loss_start_frame=0, loss_stride=2)
    for k in ("pose_loss", "vel_loss", "contact_loss"):
        assert np.isfinite(float(out["terms"][k])), k
    g = np.asarray(out["action_grad"])
    assert np.isfinite(g).all()
    assert float(np.abs(g).max()) > 0.0


def test_hang_loss_tiny_rollout_smoke():
    """HangLoss driven end-to-end by the hit scene (towel cloth vertices vs
    a set_target; reference loss_hang.py:41-59): finite terms + finite,
    nonzero action gradients through the cloth-coupled rollout."""
    from softmac_tpu import SoftMacEnv, load
    from pathlib import Path
    root = Path(__file__).resolve().parents[1]
    cfg = load(str(root / "softmac_tpu/config/demo_hit_config.py"))
    cfg.defrost()
    # cylinder straddling the towel plane (towel z ~ 0.409 at this x/y)
    # so cloth contact engages within the 2-step horizon
    cfg.SHAPES = [{
        "shape": "cylinder", "radius": 0.02, "height": 0.04,
        "init_pos": [0.46, 0.35, 0.42], "n_particles": 256,
        "color": 0, "init_rot": [np.cos(np.pi / 4), np.sin(np.pi / 4), 0, 0],
    }]
    cfg.ENV.loss_type = "HangLoss"
    cfg.ENV.loss.weight = (1.0, 0.01)
    cfg.freeze()
    env = SoftMacEnv(cfg, search_dirs=[str(root)])
    assert type(env.loss).__name__ == "HangLoss"
    env.set_control_idx(np.zeros(env.n_particles, np.int32))

    # hang target: the towel shifted up-and-over (a reachable pose)
    rest = np.asarray(env.cloth_model.init_state().x)
    env.loss.set_target(rest + np.array([0.05, 0.08, 0.0]))

    # the towel is a vertical sheet at z ~ 0.39-0.445; push the controlled
    # cylinder in -z so contact engages within the 2-step horizon
    actions = np.zeros((2, env.action_dim))
    actions[:, 2] = -8.0
    out = env.rollout_and_grad(actions, loss_stride=env.substeps)
    for k in ("pose_loss", "vel_loss"):
        assert np.isfinite(float(out["terms"][k])), k
    g = np.asarray(out["action_grad"])
    assert np.isfinite(g).all()
    assert float(np.abs(g).max()) > 0.0
