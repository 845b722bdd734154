"""Task losses for the rigid-coupled scenes.

Parity sources: ``softmac/engine/losses/loss_pour.py`` (chamfer + pose +
velocity), ``loss_grip.py`` (adds rotation band penalty), ``loss_door.py``
(pose-on-quaternion + velocity + min-contact-distance), ``loss_transport.py``
(target-point pose + two-controller contact). Each loss exposes pure
``terms(sample) -> dict`` evaluated at sampled frames inside the jitted
rollout; weighting and summation follow the reference's ``sum_up_loss``.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from softmac_tpu.engine.losses.common import FrameSample, chamfer, load_target


class LossBase:
    term_names = ()

    def __init__(self, cfg, scene):
        self.cfg = cfg
        self.scene = scene

    def terms(self, sample: FrameSample) -> dict:
        raise NotImplementedError

    def total(self, terms: dict) -> jnp.ndarray:
        return sum(terms.values())


class PourLoss(LossBase):
    term_names = ("chamfer_loss", "pose_loss", "vel_loss")

    def __init__(self, cfg, scene):
        super().__init__(cfg, scene)
        w = cfg.weight
        self.chamfer_weight, self.pose_weight, self.velocity_weight = w[0], w[1], w[2]
        self.target_x = jnp.asarray(
            load_target(cfg.target_path, scene.search_dirs), scene.dtype)

    def terms(self, s: FrameSample) -> dict:
        out = {}
        out["chamfer_loss"] = self.chamfer_weight * (
            chamfer(s.x, self.target_x) if self.chamfer_weight > 0 else 0.0)
        # pose: pull the controlled body's height to 0.4 (loss_pour.py:73-79)
        out["pose_loss"] = self.pose_weight * 10.0 * (s.bodies.pos[0, 1] - 0.4) ** 2
        out["vel_loss"] = self.velocity_weight * (
            jnp.sum(s.bodies.v[0] ** 2) + 0.1 * jnp.sum(s.bodies.w[0] ** 2))
        return out


class GripLoss(LossBase):
    term_names = ("chamfer_loss", "pose_loss", "vel_loss")

    def __init__(self, cfg, scene):
        super().__init__(cfg, scene)
        w = cfg.weight
        self.chamfer_weight, self.pose_weight, self.velocity_weight = w[0], w[1], w[2]
        self.target_x = jnp.asarray(
            load_target(cfg.target_path, scene.search_dirs), scene.dtype)

    def terms(self, s: FrameSample) -> dict:
        out = {}
        out["chamfer_loss"] = self.chamfer_weight * (
            chamfer(s.x, self.target_x) if self.chamfer_weight > 0 else 0.0)
        # loss_grip.py:74-79: height pull + rotation band on |quat_w|
        qw = jnp.abs(s.bodies.quat[0, 0])
        pose = 10.0 * (s.bodies.pos[0, 1] - 0.4) ** 2
        pose = pose + jnp.minimum(0.0, qw - 0.5) ** 2
        pose = pose + jnp.maximum(0.0, qw - 0.9) ** 2
        out["pose_loss"] = self.pose_weight * pose
        out["vel_loss"] = self.velocity_weight * (
            jnp.sum(s.bodies.v[0] ** 2) + 0.1 * jnp.sum(s.bodies.w[0] ** 2))
        return out


class DoorLoss(LossBase):
    term_names = ("pose_loss", "vel_loss", "contact_loss")

    def __init__(self, cfg, scene):
        super().__init__(cfg, scene)
        w = cfg.weight
        self.pose_weight, self.velocity_weight, self.contact_weight = w[0], w[1], w[2]

    def terms(self, s: FrameSample) -> dict:
        out = {}
        # loss_door.py:36-37: door quaternion w pulled to cos(pi/8)
        out["pose_loss"] = self.pose_weight * (
            s.bodies.quat[0, 0] - np.cos(np.pi / 8)) ** 2
        out["vel_loss"] = self.velocity_weight * jnp.sum(s.bodies.v[0] ** 2)
        # loss_door.py:53-61: squared min over particles of hinged distance
        d2 = jnp.sum((s.x - s.bodies.pos[0]) ** 2, axis=-1)
        min_dist = jnp.min(jnp.maximum(d2 - 0.01, 0.0))
        out["contact_loss"] = self.contact_weight * min_dist ** 2
        return out


class TransportLoss(LossBase):
    term_names = ("pose_loss", "vel_loss", "contact_loss")

    def __init__(self, cfg, scene, target=(0.5, 0.4, 0.5)):
        super().__init__(cfg, scene)
        w = cfg.weight
        self.pose_weight, self.velocity_weight, self.contact_weight = w[0], w[1], w[2]
        self.target = np.asarray(cfg.get("target", target), np.float64)

    def terms(self, s: FrameSample) -> dict:
        out = {}
        out["pose_loss"] = self.pose_weight * jnp.sum(
            (s.bodies.pos[0] - jnp.asarray(self.target, s.x.dtype)) ** 2)
        out["vel_loss"] = self.velocity_weight * jnp.sum(s.bodies.v[0] ** 2)
        n_half = s.x.shape[0] // 2
        d2 = jnp.sum((s.x - s.bodies.pos[0]) ** 2, axis=-1)
        m1 = jnp.min(jnp.maximum(d2[:n_half] - 0.01, 0.0))
        m2 = jnp.min(jnp.maximum(d2[n_half:] - 0.01, 0.0))
        out["contact_loss"] = self.contact_weight * (m1 ** 2 + m2 ** 2)
        return out
