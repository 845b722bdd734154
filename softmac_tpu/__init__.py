"""softmac-tpu: a TPU-native differentiable soft-body simulation framework.

Same capabilities as SoftMAC (forecast-based contact, two-way coupling of
MLS-MPM soft bodies with articulated rigid bodies and cloth), re-designed for
TPUs: one jitted differentiable rollout (JAX/XLA/Pallas), pytree state,
``jax.grad`` end-to-end, sharding via ``jax.sharding`` for multi-chip.
"""
import os as _os

# Persistent XLA compilation cache: the long-horizon differentiated rollouts
# compile for minutes on this class of host; caching makes every repeat
# demo/bench invocation start hot. Opt out with SOFTMAC_TPU_NO_COMPILE_CACHE.
if not _os.environ.get("SOFTMAC_TPU_NO_COMPILE_CACHE"):
    import jax as _jax
    _jax.config.update("jax_compilation_cache_dir",
                       _os.path.expanduser("~/.cache/jax_softmac"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from softmac_tpu.config import load, get_cfg_defaults, CN
from softmac_tpu.engine.env import SoftMacEnv, TaichiEnv

__version__ = "0.1.0"

__all__ = ["load", "get_cfg_defaults", "CN", "SoftMacEnv", "TaichiEnv"]
