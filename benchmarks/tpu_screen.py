#!/usr/bin/env python
"""On-chip validation + timing of the pool-screening chain kernel.

Pool screening is the other hot op of an ADAPT epoch (the whole-pool
gradient pass that replaces the reference's pool-append + backprop,
``/root/reference/models/adapt_vqe.py:306-314``).  The VMEM-resident
screen chain kernel (`engine/pallas_kernels.screen_chain_pallas`) is
validated in interpret mode by tests/test_pallas.py but — unlike the
rotation/expectation/apply chains (benchmarks/tpu_pallas.json) — has
never run on the real chip.

CPU mode (--cpu / JAX_PLATFORMS=cpu, QSFH_PROFILE_ALLOW_CPU=1) writes
the expected per-generator gradients for a seeded random state
(screen_expected.json).  TPU mode compares the on-chip pallas-lowered
screening against that trace, then times it MARGINALLY (chained
screenings of two lengths, one fetch — cancels tunnel RTT), for both
the XLA-scan and the chain-kernel lowerings.  Writes tpu_screen.json.
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
EXPECTED_PATH = os.path.join(HERE, "screen_expected.json")


def main() -> int:
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu" or "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    platform = jax.devices()[0].platform
    on_cpu = platform == "cpu"
    if on_cpu and not os.environ.get("QSFH_PROFILE_ALLOW_CPU"):
        print("tpu_screen: no TPU platform; refusing to record", file=sys.stderr)
        return 1

    import jax.numpy as jnp
    from jax import lax

    from qsfh_tpu.algos.base import HubbardProblem
    from qsfh_tpu.engine.expectation import Observable, PackedPool
    from qsfh_tpu.engine.state import from_reim
    from qsfh_tpu.ops.jw import jordan_wigner
    from qsfh_tpu.ops.pool import hubbard_interaction_pool_simplified

    # exactly ADAPT's own screening setup (adapt.py: qubit_pool/packed_pool)
    p = HubbardProblem(3, 3, 1.0, 6.0, 9, 5, 4)
    gens = [jordan_wigner(g) for g in hubbard_interaction_pool_simplified(3, 3)]
    obs = Observable(p.qubit_hamiltonian, p.n_qubits)

    rng = np.random.default_rng(11)
    v = rng.standard_normal(1 << N) + 1j * rng.standard_normal(1 << N)
    v /= np.linalg.norm(v)
    psi_reim = jnp.asarray(np.stack([v.real, v.imag]).astype(np.float32))

    def build(pallas: str):
        # PackedPool snapshots nothing env-dependent at ctor time, but the
        # scan body reads QSFH_PALLAS at TRACE time — set it around jit
        os.environ["QSFH_PALLAS"] = pallas
        pool = PackedPool(gens, p.n_qubits)

        @jax.jit
        def screen_once(pr):
            psi = from_reim(pr, jnp.complex64)
            w = obs.apply_scan(psi)
            return pool.screen_scan(psi, w)

        @jax.jit
        def screen_chain(pr, scales):
            psi = from_reim(pr, jnp.complex64)

            def body(tot, a):
                ps = psi * a
                w = obs.apply_scan(ps)
                return tot + pool.screen_scan(ps, w), None

            tot, _ = lax.scan(body, jnp.zeros(pool.size, jnp.float32), scales)
            return tot

        return screen_once, screen_chain

    out: dict = {
        "platform": str(jax.devices()[0]),
        "n_qubits": N,
        "pool_size": len(gens),
        "h_terms": len(obs),
    }
    t0 = time.time()

    def log(msg):
        print(f"[screen +{time.time()-t0:6.1f}s] {msg}", file=sys.stderr, flush=True)

    screen_once, screen_chain = build("1" if not on_cpu else "0")
    grads = np.asarray(screen_once(psi_reim))
    log(f"screen_once done, |g| = {np.linalg.norm(grads):.6f}")

    if on_cpu:
        with open(EXPECTED_PATH, "w") as f:
            json.dump({"grads": grads.tolist()}, f)
        print("wrote expected screening trace (CPU)", file=sys.stderr)
        return 0

    if not os.path.exists(EXPECTED_PATH):
        print("no expected trace; run once with --cpu first", file=sys.stderr)
        return 1
    ref = np.asarray(json.load(open(EXPECTED_PATH))["grads"])
    scale = max(float(np.max(np.abs(ref))), 1e-9)
    err = float(np.max(np.abs(grads - ref)) / scale)
    out["rel_err"] = err
    # The 2.4e-3 error once blamed on "Mosaic reduction-order noise" was
    # actually the MXU's default f32 matmul truncating the XOR-permutation
    # inputs to bf16 (benchmarks/tpu_op_probe.jsonl); with
    # Precision.HIGHEST the permutation is bit-exact on-chip, so the
    # remaining difference is genuine f32 reduction-order noise near the
    # CPU-f32 floor of 8.4e-7 (benchmarks/screen_noise_floor.json).
    out["correct"] = bool(err < 1e-4)
    top_ref = np.argsort(-np.abs(ref))[:5]
    top_tpu = np.argsort(-np.abs(grads))[:5]
    out["top5_ref"] = top_ref.tolist()
    out["top5_tpu"] = top_tpu.tolist()
    out["argmax_match"] = bool(top_ref[0] == top_tpu[0])
    out["correct"] = out["correct"] and out["argmax_match"]
    log(f"max |g - g_cpu| / max|g_cpu| = {err:.2e}; "
        f"argmax match = {out['argmax_match']}")
    if not out["correct"]:
        print("tpu_screen: PARITY FAIL; not recording timing", file=sys.stderr)
        with open(os.path.join(HERE, "tpu_screen.json"), "w") as f:
            json.dump(out, f, indent=1)
        return 1

    # marginal timing per whole-pool screening, both lowerings
    def time_chain(chain):
        ts = {}
        for k in (4, 12):
            scales = jnp.linspace(1.0, 1.0001, k, dtype=jnp.float32)
            np.asarray(chain(psi_reim, scales))  # compile + warm + fetch
            samples = []
            for _ in range(5):
                s0 = time.time()
                np.asarray(chain(psi_reim, scales))
                samples.append(time.time() - s0)
            ts[k] = float(np.median(samples))
        return 1e3 * (ts[12] - ts[4]) / 8, ts

    for name, flag in (("chain", "1"), ("xla", "0")):
        _, chain = build(flag)
        per, raw = time_chain(chain)
        out[f"screen_ms_{name}"] = round(per, 3)
        out[f"screen_total_ms_{name}"] = {
            str(k): round(1e3 * val, 1) for k, val in raw.items()
        }
        log(f"{name}: {per:.3f} ms per whole-pool screening")

    with open(os.path.join(HERE, "tpu_screen.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("tpu_screen:", json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
