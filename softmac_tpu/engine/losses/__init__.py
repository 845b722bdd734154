"""Loss registry (the reference resolves loss_type via ``eval``,
``softmac/engine/taichi_env.py:51``; here it is an explicit registry)."""
from softmac_tpu.engine.losses.common import FrameSample, chamfer, pairwise_sqdist
from softmac_tpu.engine.losses.rigid_losses import (
    DoorLoss, GripLoss, LossBase, PourLoss, TransportLoss,
)
from softmac_tpu.engine.losses.cloth_losses import HangLoss, HitLoss, TacoLoss

LOSS_REGISTRY = {
    "PourLoss": PourLoss,
    "GripLoss": GripLoss,
    "DoorLoss": DoorLoss,
    "TransportLoss": TransportLoss,
    "TacoLoss": TacoLoss,
    "HangLoss": HangLoss,
    "HitLoss": HitLoss,
}

__all__ = [
    "FrameSample", "chamfer", "pairwise_sqdist", "LossBase",
    "PourLoss", "GripLoss", "DoorLoss", "TransportLoss",
    "TacoLoss", "HangLoss", "HitLoss", "LOSS_REGISTRY",
]
