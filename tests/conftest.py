"""Test configuration: force an 8-device CPU backend and 64-bit precision.

This is the standard JAX fake-backend trick (SURVEY.md section 4): sharding
and collective tests run against a virtual 8-device CPU mesh, so the
multi-chip code paths are exercised without TPU pod hardware.

Note: the sandbox preimports jax via sitecustomize (axon TPU plugin), so the
platform must be forced via jax.config, not env vars.  The real TPU also
rejects complex128 ("C128 is not supported on TPU"); CPU tests run the
engine's float64/complex128 path, TPU runs complex64.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if os.environ.get("QSFH_TPU_TESTS") == "1":
    # keep the real TPU platform: runs the TPU-gated tests (Mosaic lowering
    # regression guards, test_pallas_lowering.py) that the CPU env must skip
    pass
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
