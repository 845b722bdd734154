"""softmac-tpu: a TPU-native differentiable soft-body simulation framework.

Same capabilities as SoftMAC (forecast-based contact, two-way coupling of
MLS-MPM soft bodies with articulated rigid bodies and cloth), re-designed for
TPUs: one jitted differentiable rollout (JAX/XLA/Pallas), pytree state,
``jax.grad`` end-to-end, sharding via ``jax.sharding`` for multi-chip.
"""
from softmac_tpu.config import load, get_cfg_defaults, CN
from softmac_tpu.engine.env import SoftMacEnv, TaichiEnv

__version__ = "0.1.0"

__all__ = ["load", "get_cfg_defaults", "CN", "SoftMacEnv", "TaichiEnv"]
