#!/usr/bin/env python
"""On-chip validation + timing of the shot-based measurement pipeline.

The grouped QWC estimator (engine/sampling.py) is the hardware-realistic
expectation path: per-group basis rotation, categorical bitstring
sampling from |psi|^2, signed-eigenvalue averaging.  This leg runs the
SCAN lowering (one program, groups ride as data) on the flagship 18-qubit
3x3 Hamiltonian against a host-fed random state.

CPU mode (--cpu / JAX_PLATFORMS=cpu + QSFH_PROFILE_ALLOW_CPU=1) writes
sampling_expected.json: the float64 analytic energy of the state (the
ground truth the shot estimate must bracket).  TPU mode runs the sampler
on-chip, checks |estimate - analytic| < 5 sigma AND a determinism probe
(samples from a basis state are exactly its index), then times the full
grouped estimate MARGINALLY via two chain lengths (cancels tunnel RTT).
Writes tpu_sampling.json.  Program salt: QSFH_BENCH_SALT folds into a
traced logits constant so every retry gets a fresh program hash.
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

NX = int(os.environ.get("QSFH_SAMPLING_NX", "3"))
NY = int(os.environ.get("QSFH_SAMPLING_NY", "3"))
N = 2 * NX * NY
SHOTS = int(os.environ.get("QSFH_SAMPLING_SHOTS", "2048"))
K1, K2 = 1, 3
_SUFFIX = "" if (NX, NY) == (3, 3) else f"_{NX}x{NY}"
EXPECTED_PATH = os.path.join(HERE, f"sampling_expected{_SUFFIX}.json")
OUT_PATH = os.path.join(HERE, f"tpu_sampling{_SUFFIX}.json")


def main() -> int:
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu" or "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    platform = jax.devices()[0].platform
    on_cpu = platform == "cpu"
    if on_cpu and not os.environ.get("QSFH_PROFILE_ALLOW_CPU"):
        print("tpu_sampling: no TPU platform; refusing to record", file=sys.stderr)
        return 1

    import jax.numpy as jnp
    from jax import lax

    from qsfh_tpu.algos.base import HubbardProblem
    from qsfh_tpu.engine.expectation import Observable
    from qsfh_tpu.engine.sampling import (
        _rotate_data_driven,
        pack_groups,
        qwc_groups,
        sample_bitstrings,
    )
    from qsfh_tpu.engine.state import from_reim

    salt = float(os.environ.get("QSFH_BENCH_SALT", "0"))

    n_sites = NX * NY
    n_up = (n_sites + 1) // 2
    p = HubbardProblem(NX, NY, 1.0, 6.0, n_sites, n_up, n_sites - n_up)
    ham = p.qubit_hamiltonian
    groups = qwc_groups(ham)
    const, masks, coeffs, x_bits, y_bits = pack_groups(ham, N, groups)
    g = masks.shape[0]

    rng = np.random.default_rng(13)
    v = rng.standard_normal(1 << N) + 1j * rng.standard_normal(1 << N)
    v /= np.linalg.norm(v)
    psi_reim = jnp.asarray(np.stack([v.real, v.imag]).astype(np.float32))

    t0 = time.time()

    def log(msg):
        print(f"[sampling +{time.time()-t0:6.1f}s] {msg}", file=sys.stderr, flush=True)

    if on_cpu and not os.environ.get("QSFH_FORCE_MEASURE"):
        analytic = float(
            np.real(
                Observable(ham, N).expectation(jnp.asarray(v.astype(np.complex128)))
            )
        )
        with open(EXPECTED_PATH, "w") as f:
            json.dump(
                {"analytic": analytic, "n_groups": g, "seed": 13, "shots": SHOTS},
                f,
            )
        log(f"wrote expected analytic energy {analytic:.9f} ({g} groups)")
        return 0

    if not os.path.exists(EXPECTED_PATH):
        print("no expected trace; run once with --cpu first", file=sys.stderr)
        return 1
    exp = json.load(open(EXPECTED_PATH))
    if exp["n_groups"] != g or exp["shots"] != SHOTS:
        print("tpu_sampling: expected-trace config mismatch; regenerate", file=sys.stderr)
        return 1
    analytic = exp["analytic"]

    xs_static = (
        jnp.asarray(masks),
        jnp.asarray(coeffs, dtype=jnp.float32),
        jnp.asarray(x_bits, dtype=jnp.float32),
        jnp.asarray(y_bits, dtype=jnp.float32),
    )

    def estimate_once(psi, key):
        keys = jax.random.split(key, g)

        def body(_, xs):
            k, m, c, xb, yb = xs
            rot = _rotate_data_driven(psi, N, xb, yb)
            # the LIBRARY sampler (inverse-CDF counting, engine/sampling.py)
            # -- this leg measures the real code path; the salt folds into
            # the amplitudes so every retry gets a fresh program hash
            rot = rot * (1.0 + jnp.float32(salt * 1e-30)).astype(rot.dtype)
            samples = sample_bitstrings(rot, N, SHOTS, k)
            par = lax.population_count(samples[:, None] & m[None, :]) & jnp.uint32(1)
            signs = 1.0 - 2.0 * par.astype(jnp.float32)
            per_shot = signs @ c
            mean = jnp.mean(per_shot)
            var = jnp.var(per_shot, ddof=1) / SHOTS
            return None, (mean, var)

        _, (means, variances) = lax.scan(body, None, (keys,) + xs_static)
        return jnp.sum(means), jnp.sum(variances)

    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def run_chain(pr, key, n_chain):
        psi = from_reim(pr, jnp.complex64)

        def body(tot, k):
            m, vv = estimate_once(psi, k)
            return tot + jnp.stack([m, vv]), None

        keys = jax.random.split(key, n_chain)
        tot, _ = lax.scan(body, jnp.zeros(2, jnp.float32), keys)
        return tot

    @jax.jit
    def determinism_probe(key):
        # basis state |0...01>: every sample must be index 1 exactly
        probe = (jnp.arange(1 << 4) == 1).astype(jnp.complex64)
        probe = probe * (1.0 + jnp.float32(salt * 1e-30)).astype(jnp.complex64)
        s = sample_bitstrings(probe, 4, 64, key).astype(jnp.int32)
        return jnp.sum(jnp.abs(s - 1))

    out = {
        "platform": str(jax.devices()[0]),
        "n_qubits": N,
        "n_groups": g,
        "shots": SHOTS,
        "analytic": analytic,
    }

    dp = int(determinism_probe(jax.random.PRNGKey(0)))
    out["determinism_probe"] = dp
    log(f"determinism probe (must be 0): {dp}")

    key = jax.random.PRNGKey(17)
    tot = np.asarray(run_chain(psi_reim, key, K1), dtype=np.float64)
    est = const + tot[0] / K1
    stderr = float(np.sqrt(tot[1] / K1))
    z = abs(est - analytic) / max(stderr, 1e-12)
    out.update(estimate=float(est), stderr=stderr, z_score=float(z))
    out["correct"] = bool(dp == 0 and z < 5.0)
    log(f"estimate {est:.6f} vs analytic {analytic:.6f} (z = {z:.2f})")

    if not out["correct"]:
        print("tpu_sampling: VALIDATION FAIL; not recording timing", file=sys.stderr)
        with open(OUT_PATH, "w") as f:
            json.dump(out, f, indent=1)
        return 1

    # marginal timing: chain K1 vs K2 grouped estimates, one fetch each.
    # WARM BOTH chain lengths first: static_argnums makes each length its
    # own program, and the round-2 recorded 18.3 s "marginal" was in fact
    # dominated by the unwarmed K2 program's tunnel compile time.
    times = {}
    for k_len in (K1, K2):
        np.asarray(run_chain(psi_reim, key, k_len))  # compile + warm
    for k_len in (K1, K2):
        samples = []
        for _ in range(3):
            t1 = time.time()
            np.asarray(run_chain(psi_reim, key, k_len))
            samples.append(time.time() - t1)
        times[k_len] = float(np.median(samples))
    marginal = (times[K2] - times[K1]) / (K2 - K1)
    out["estimate_ms_marginal"] = round(marginal * 1000, 3)
    out["shots_per_sec"] = round(g * SHOTS / max(marginal, 1e-9), 1)
    log(
        f"marginal grouped-estimate time {out['estimate_ms_marginal']} ms "
        f"({out['shots_per_sec']:.0f} group-shots/s)"
    )
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
