"""Test configuration: force an 8-device CPU backend and 64-bit precision.

This is the standard JAX fake-backend trick (SURVEY.md section 4): sharding
and collective tests run against a virtual 8-device CPU mesh, so the
multi-chip code paths are exercised without TPU pod hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)
