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

    # --- timing: MARGINAL us/rotation between two chain lengths.
    # A single fetch-synced call is tunnel-RTT dominated (tens of ms, window
    # dependent); (t(K2) - t(K1)) / (K2 - K1) cancels the RTT constant. ---
    K1, K2 = K, 3 * K

    def theta_vec(k):
        return jnp.linspace(0.01, 0.5, k, dtype=jnp.float32)

    def chain(rotfn):
        @jax.jit
        def prog(pr, ths):
            psi = from_reim(pr, jnp.complex64)

            def body(p, th):
                return rotfn(p, th), None

            psi, _ = lax.scan(body, psi, ths)
            return jnp.vdot(psi, psi).real

        return prog

    def time_prog(prog):
        ts = {}
        for k in (K1, K2):
            ths = theta_vec(k)
            float(prog(psi_reim, ths))  # compile + warm
            samples = []
            for _ in range(5):
                t0 = time.time()
                float(prog(psi_reim, ths))
                samples.append(time.time() - t0)
            ts[k] = float(np.median(samples))
        return 1e6 * (ts[K2] - ts[K1]) / (K2 - K1), ts

    for name, fn in (("xla", xla_rot), ("pallas", pallas_rot)):
        per_op, raw = time_prog(chain(fn))
        out[f"{name}_us_per_rot"] = round(per_op, 1)
        out[f"{name}_total_ms"] = {str(k): round(1e3 * v, 1) for k, v in raw.items()}

    # --- VMEM-resident chain kernel: the whole K-rotation product in one
    # pallas call (2 HBM plane transfers total instead of per rotation) ---
    from qsfh_tpu.engine.pallas_kernels import pauli_chain_pallas

    def arrs(k):
        return (
            jnp.full(k, xb, jnp.uint32),
            jnp.full(k, zb, jnp.uint32),
            jnp.full(k, phre, jnp.float32),
            jnp.full(k, phim, jnp.float32),
        )

    @jax.jit
    def chain_prog(pr, ths):
        psi = from_reim(pr, jnp.complex64)
        xs_a, zs_a, pr_a, pi_a = arrs(ths.shape[0])
        psi = pauli_chain_pallas(psi, N, xs_a, zs_a, ths, pr_a, pi_a)
        return jnp.vdot(psi, psi).real

    @jax.jit
    def chain_err(pr, ths):
        psi = from_reim(pr, jnp.complex64)
        xs_a, zs_a, pr_a, pi_a = arrs(ths.shape[0])
        a = pauli_chain_pallas(psi, N, xs_a, zs_a, ths, pr_a, pi_a)
        b = psi
        for k in range(16):  # short unrolled reference: heavy straight-line
            b = xla_rot(b, ths[k])  # programs stall the compile service
        def body(p, th):
            return xla_rot(p, th), None
        b, _ = lax.scan(body, b, ths[16:])
        return jnp.linalg.norm(a - b) / jnp.linalg.norm(b)

    out["chain_rel_err"] = float(chain_err(psi_reim, theta_vec(K)))
    per_op, raw = time_prog(chain_prog)
    out["chain_us_per_rot"] = round(per_op, 1)
    out["chain_total_ms"] = {str(k): round(1e3 * v, 1) for k, v in raw.items()}
    ok = ok and out["chain_rel_err"] < 1e-4

    # --- observable chain kernels on the real 3x3 Hamiltonian ---
    from qsfh_tpu.algos.base import HubbardProblem
    from qsfh_tpu.engine.expectation import Observable

    p3 = HubbardProblem(3, 3, 1.0, 6.0, 9, 5, 4)
    obs = Observable(p3.qubit_hamiltonian, p3.n_qubits)
    out["h_terms"] = len(obs)

    def eval_prog():
        # traces obs.expectation_scan under the CURRENT QSFH_PALLAS env
        @jax.jit
        def prog(pr, scales):
            psi = from_reim(pr, jnp.complex64)

            def body(tot, a):
                return tot + obs.expectation_scan(psi * a), None

            tot, _ = lax.scan(body, jnp.float32(0.0), scales)
            return tot

        return prog

    def time_eval(prog):
        ts = {}
        for k in (8, 24):
            scales = jnp.linspace(1.0, 1.0001, k, dtype=jnp.float32)
            float(prog(psi_reim, scales))
            samples = []
            for _ in range(5):
                t0 = time.time()
                float(prog(psi_reim, scales))
                samples.append(time.time() - t0)
            ts[k] = float(np.median(samples))
        return 1e3 * (ts[24] - ts[8]) / 16

    os.environ["QSFH_PALLAS"] = "0"
    prog = eval_prog()
    e_xla_v = float(prog(psi_reim, jnp.ones(8, jnp.float32))) / 8
    out["energy_eval_xla_ms"] = round(time_eval(prog), 3)
    os.environ["QSFH_PALLAS"] = "1"
    prog = eval_prog()
    e_pl_v = float(prog(psi_reim, jnp.ones(8, jnp.float32))) / 8
    out["energy_eval_chain_ms"] = round(time_eval(prog), 3)
    out["energy_eval_rel_err"] = abs(e_pl_v - e_xla_v) / max(abs(e_xla_v), 1e-9)
    ok = ok and out["energy_eval_rel_err"] < 1e-4
    del os.environ["QSFH_PALLAS"]

    if ok:
        timings = {
            k: out[f"{k}_us_per_rot"] for k in ("xla", "pallas", "chain")
            if f"{k}_us_per_rot" in out
        }
        out["recommend"] = min(timings, key=timings.get)
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
