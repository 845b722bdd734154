"""Test configuration: run on CPU with 8 virtual devices and x64 enabled.

The engine itself is dtype-parametric (f32 on TPU, f64 on CPU); tests use the
CPU f64 build as the high-precision oracle, and the 8 virtual devices let the
multi-chip sharding paths (softmac_tpu.parallel) execute without TPU hardware.
"""
import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
