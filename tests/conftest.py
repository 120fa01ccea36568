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
import tempfile

# Session-shared exact-diagonalization cache: driver tests construct
# ADAPT/HVA instances against fresh tmp results_roots, and each 2x2 sector
# Lanczos solve costs ~7 s (mostly its jit compile).  The read-through
# cache (algos/base.py ground_state) makes the suite pay for each lattice
# config ONCE.  Honor an externally-set dir (e.g. a warm CI cache).
if "QSFH_ED_CACHE_DIR" not in os.environ:
    os.environ["QSFH_ED_CACHE_DIR"] = tempfile.mkdtemp(prefix="qsfh_ed_cache_")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags and not os.environ.get(
    "QSFH_TPU_TESTS"
):
    # the CPU suite is compile-dominated (hundreds of small jits); dialing
    # back LLVM effort cuts wall time ~30% with identical semantics (no
    # fast-math -- only codegen optimization effort changes)
    flags += (
        " --xla_backend_optimization_level=0"
        " --xla_llvm_disable_expensive_passes=true"
    )
os.environ["XLA_FLAGS"] = flags

import jax

if os.environ.get("QSFH_TPU_TESTS") == "1":
    # keep the real TPU platform: runs the TPU-gated tests (Mosaic lowering
    # regression guards, test_pallas_lowering.py) that the CPU env must skip
    pass
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
