#!/usr/bin/env python
"""On-chip validation + timing of the ITE step and the Lanczos recursion.

Both new solver families (algos/ite.py, linalg/spectral.py) reduce to
matrix-free H applications, so on TPU they ride the same scan/pallas
chain kernels as the drivers; this leg proves the composed programs
lower, run, and agree with the host-f64 trace at the flagship 18 qubits.

CPU mode (--cpu / JAX_PLATFORMS=cpu + QSFH_PROFILE_ALLOW_CPU=1) writes
ite_expected.json: f64 energies/variances of K ITE steps from a seeded
random state plus the first m Lanczos (alpha, beta) coefficients.  TPU
mode reruns both in complex64, checks relative error < 1e-3, then times
the ITE step MARGINALLY via two chain lengths.  Writes tpu_ite.json.
QSFH_BENCH_SALT folds into a traced additive constant (fresh hash per
retry).
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
DBETA = 0.01
ORDER = 2
K1, K2 = 4, 12
M_LANCZOS = 8
EXPECTED_PATH = os.path.join(HERE, "ite_expected.json")
OUT_PATH = os.path.join(HERE, "tpu_ite.json")


def main() -> int:
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu" or "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    platform = jax.devices()[0].platform
    on_cpu = platform == "cpu"
    if on_cpu and not os.environ.get("QSFH_PROFILE_ALLOW_CPU"):
        print("tpu_ite: no TPU platform; refusing to record", file=sys.stderr)
        return 1

    import jax.numpy as jnp
    from jax import lax

    from qsfh_tpu.algos.base import HubbardProblem
    from qsfh_tpu.algos.ite import ImaginaryTimeEvolution
    from qsfh_tpu.engine.state import from_reim, to_reim

    salt = float(os.environ.get("QSFH_BENCH_SALT", "0"))
    # QSFH_FORCE_MEASURE: exercise the measure path on CPU (f32, like TPU)
    expected_mode = on_cpu and not os.environ.get("QSFH_FORCE_MEASURE")
    dtype = jnp.complex128 if expected_mode else jnp.complex64
    rdt = jnp.float64 if expected_mode else jnp.float32

    if expected_mode:
        jax.config.update("jax_enable_x64", True)

    p = HubbardProblem(3, 3, 1.0, 6.0, 9, 5, 4)
    ite = ImaginaryTimeEvolution(p, dbeta=DBETA, order=ORDER, dtype=dtype)

    rng = np.random.default_rng(19)
    v = rng.standard_normal(1 << N) + 1j * rng.standard_normal(1 << N)
    v /= np.linalg.norm(v)
    psi_reim = jnp.asarray(
        np.stack([v.real, v.imag]).astype(np.float64 if expected_mode else np.float32)
    )

    t0 = time.time()

    def log(msg):
        print(f"[ite +{time.time()-t0:6.1f}s] {msg}", file=sys.stderr, flush=True)

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def ite_chain(pr, k):
        psi = from_reim(pr, dtype)

        def body(psi, _):
            psi, e, var, _lw = ite._step(psi)
            return psi, (e, var)

        psi, (es, vs) = lax.scan(body, psi, None, length=k)
        return es + jnp.asarray(salt * 1e-30, rdt), vs

    @jax.jit
    def lanczos_coeffs(pr):
        v0 = from_reim(pr, dtype)
        v0 = v0 / jnp.linalg.norm(v0)

        def body(carry, _):
            v, v_prev, beta_prev = carry
            w = ite.observable.apply_auto(v)
            alpha = jnp.real(jnp.vdot(v, w)).astype(rdt)
            w = w - alpha * v - beta_prev * v_prev
            beta = jnp.linalg.norm(w).astype(rdt)
            v_next = jnp.where(beta > 1e-14, w / jnp.maximum(beta, 1e-30), w * 0)
            return (v_next, v, beta), (alpha, beta)

        _, (alphas, betas) = lax.scan(
            body, (v0, jnp.zeros_like(v0), jnp.zeros((), rdt)), None,
            length=M_LANCZOS,
        )
        return alphas + jnp.asarray(salt * 1e-30, rdt), betas

    es, vs = (np.asarray(a, np.float64) for a in ite_chain(psi_reim, K1))
    alphas, betas = (np.asarray(a, np.float64) for a in lanczos_coeffs(psi_reim))
    log(f"ITE E[0]={es[0]:.6f} E[-1]={es[-1]:.6f}; lanczos a0={alphas[0]:.6f}")

    if expected_mode:
        with open(EXPECTED_PATH, "w") as f:
            json.dump(
                {
                    "config": [N, DBETA, ORDER, K1, M_LANCZOS, 19],
                    "energies": es.tolist(),
                    "variances": vs.tolist(),
                    "alphas": alphas.tolist(),
                    "betas": betas.tolist(),
                },
                f,
            )
        log("wrote expected ITE/Lanczos trace (CPU f64)")
        return 0

    if not os.path.exists(EXPECTED_PATH):
        print("no expected trace; run once with --cpu first", file=sys.stderr)
        return 1
    exp = json.load(open(EXPECTED_PATH))
    if exp["config"] != [N, DBETA, ORDER, K1, M_LANCZOS, 19]:
        print("tpu_ite: expected-trace config mismatch; regenerate", file=sys.stderr)
        return 1

    out = {"platform": str(jax.devices()[0]), "n_qubits": N}

    def rel(a, b):
        b = np.asarray(b)
        return float(np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-12))

    out["ite_energy_rel_err"] = rel(es, exp["energies"])
    out["ite_variance_rel_err"] = rel(vs, exp["variances"])
    out["lanczos_alpha_rel_err"] = rel(alphas, exp["alphas"])
    out["lanczos_beta_rel_err"] = rel(betas, exp["betas"])
    out["correct"] = bool(
        max(
            out["ite_energy_rel_err"],
            out["ite_variance_rel_err"],
            out["lanczos_alpha_rel_err"],
            out["lanczos_beta_rel_err"],
        )
        < 1e-3
    )
    log(f"parity: {out}")
    if not out["correct"]:
        print("tpu_ite: PARITY FAIL; not recording timing", file=sys.stderr)
        with open(OUT_PATH, "w") as f:
            json.dump(out, f, indent=1)
        return 1

    times = {}
    np.asarray(ite_chain(psi_reim, K2)[0])  # warm the K2 program (K1 already ran)
    for k in (K1, K2):
        t1 = time.time()
        np.asarray(ite_chain(psi_reim, k)[0])
        times[k] = time.time() - t1
    marginal = (times[K2] - times[K1]) / (K2 - K1)
    out["ite_step_ms_marginal"] = round(marginal * 1000, 3)
    log(f"marginal ITE step {out['ite_step_ms_marginal']} ms")
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
