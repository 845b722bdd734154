"""Task losses for the cloth-coupled scenes.

Parity: ``soft_cloth/engine/losses/loss_taco.py`` (chamfer on MPM particles),
``loss_hang.py`` / ``loss_hit.py`` (L2 on cloth vertices vs target, hang adds
a velocity term).
"""
from __future__ import annotations

import jax.numpy as jnp

from softmac_tpu.engine.losses.common import FrameSample, chamfer, load_target
from softmac_tpu.engine.losses.rigid_losses import LossBase


class TacoLoss(LossBase):
    term_names = ("chamfer_loss",)

    def __init__(self, cfg, scene):
        super().__init__(cfg, scene)
        self.chamfer_weight = cfg.weight[0]
        self.target_x = jnp.asarray(
            load_target(cfg.target_path, scene.search_dirs), scene.dtype)

    def terms(self, s: FrameSample) -> dict:
        return {"chamfer_loss": self.chamfer_weight * chamfer(s.x, self.target_x)}


class HitLoss(LossBase):
    term_names = ("pose_loss",)

    def __init__(self, cfg, scene):
        super().__init__(cfg, scene)
        self.pose_weight = cfg.weight[0]
        self.target_x = jnp.asarray(
            load_target(cfg.target_path, scene.search_dirs), scene.dtype)

    def terms(self, s: FrameSample) -> dict:
        return {"pose_loss": self.pose_weight * jnp.sum((s.cloth_x - self.target_x) ** 2)}


class HangLoss(LossBase):
    term_names = ("pose_loss", "vel_loss")

    def __init__(self, cfg, scene, target=None):
        super().__init__(cfg, scene)
        self.pose_weight = cfg.weight[0]
        self.velocity_weight = cfg.weight[1]
        self.target_x = None if target is None else jnp.asarray(target, scene.dtype)

    def set_target(self, x):
        self.target_x = jnp.asarray(x, self.scene.dtype)

    def terms(self, s: FrameSample) -> dict:
        return {
            "pose_loss": self.pose_weight * jnp.sum((s.cloth_x - self.target_x) ** 2),
            "vel_loss": self.velocity_weight * jnp.sum(s.cloth_v ** 2),
        }
