#!/usr/bin/env python
"""Validate + time the Pallas kernels on the real TPU chip (VERDICT #5).

Round 1 only ever ran `engine/pallas_kernels.py` in interpret mode on CPU.
This script, on the real chip:

1. correctness: fused `pauli_rotation_pallas` and `xor_gather_pallas`
   against the XLA lane-matmul path (`engine.compiled._rot_body` inline /
   `xor_flip_traced`) on a random 18-qubit state — relative L2 error,
   fetched as a real scalar (complex cannot cross the axon host boundary);
2. timing: K=64 dependent applications per jitted program (lax.scan chain),
   single scalar fetch, amortized per-op microseconds for both lowerings.

Writes benchmarks/tpu_pallas.json with numbers + a data-backed default
recommendation.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

N = 18
K = 64


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    if jax.devices()[0].platform == "cpu" and not os.environ.get(
        "QSFH_PROFILE_ALLOW_CPU"
    ):
        print("tpu_pallas: no TPU platform; refusing to record", file=sys.stderr)
        return 1

    from qsfh_tpu.engine.compiled import index_bits, xor_flip_traced
    from qsfh_tpu.engine.pallas_kernels import (
        pauli_rotation_pallas,
        xor_gather_pallas,
    )
    from qsfh_tpu.engine.state import from_reim

    rng = np.random.default_rng(7)
    psi_np = rng.standard_normal(1 << N) + 1j * rng.standard_normal(1 << N)
    psi_np /= np.linalg.norm(psi_np)
    psi_reim = jnp.asarray(
        np.stack([psi_np.real, psi_np.imag]).astype(np.float32)
    )
    xb = np.uint32(0b101101_0010110)  # mixed row + lane bits
    zb = np.uint32(0b011011_1001011)
    phre, phim = np.float32(0.0), np.float32(-1.0)

    idx = index_bits(N)

    def xla_rot(psi, theta):
        par = lax.population_count(idx & jnp.uint32(zb)) & jnp.uint32(1)
        s = 1.0 - 2.0 * par.astype(jnp.float32)
        t = xor_flip_traced(psi, N, jnp.uint32(xb))
        ph = (phre + 1j * phim).astype(psi.dtype)
        ppsi = ph * s.astype(psi.dtype) * t
        return jnp.cos(theta).astype(psi.dtype) * psi - 1j * jnp.sin(theta).astype(
            psi.dtype
        ) * ppsi

    def pallas_rot(psi, theta):
        return pauli_rotation_pallas(psi, N, xb, zb, theta, phre, phim)

    out: dict = {"platform": str(jax.devices()[0]), "n_qubits": N, "chain": K}

    # --- correctness (single application, device-side diff) ---
    @jax.jit
    def rot_err(pr):
        psi = from_reim(pr, jnp.complex64)
        a = pallas_rot(psi, jnp.float32(0.37))
        b = xla_rot(psi, jnp.float32(0.37))
        return jnp.linalg.norm(a - b) / jnp.linalg.norm(b)

    @jax.jit
    def gather_err(pr):
        psi = from_reim(pr, jnp.complex64)
        a = xor_gather_pallas(psi, N, jnp.uint32(xb))
        b = xor_flip_traced(psi, N, jnp.uint32(xb))
        return jnp.linalg.norm(a - b) / jnp.linalg.norm(b)

    out["rot_rel_err"] = float(rot_err(psi_reim))
    out["gather_rel_err"] = float(gather_err(psi_reim))
    ok = out["rot_rel_err"] < 1e-5 and out["gather_rel_err"] < 1e-5
    out["correct"] = bool(ok)

    # --- timing: K dependent rotations per program ---
    thetas = jnp.linspace(0.01, 0.5, K, dtype=jnp.float32)

    def chain(rotfn):
        @jax.jit
        def prog(pr, ths):
            psi = from_reim(pr, jnp.complex64)

            def body(p, th):
                return rotfn(p, th), None

            psi, _ = lax.scan(body, psi, ths)
            return jnp.vdot(psi, psi).real

        return prog

    for name, fn in (("xla", xla_rot), ("pallas", pallas_rot)):
        prog = chain(fn)
        float(prog(psi_reim, thetas))  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(prog(psi_reim, thetas))
            ts.append(time.time() - t0)
        out[f"{name}_us_per_rot"] = round(1e6 * float(np.median(ts)) / K, 1)

    if ok:
        out["recommend"] = (
            "pallas" if out["pallas_us_per_rot"] < out["xla_us_per_rot"] else "xla"
        )
    else:
        out["recommend"] = "xla (pallas INCORRECT on chip)"

    # CPU smoke runs must not produce the chip artifact
    dest = HERE if jax.devices()[0].platform != "cpu" else "/tmp"
    with open(os.path.join(dest, "tpu_pallas.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("tpu_pallas:", json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
