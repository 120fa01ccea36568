#!/usr/bin/env python
"""On-chip HVA train step, measured as ONE fused multi-iteration program.

Same methodology as benchmarks/tpu_step_fused.py (the ADAPT flagship
measurement): HVA's raw split stages (algos/hva.py step.raw_stages) are
composed into a single salted jit with K iterations UNROLLED, |psi0> fed
as a host (2, 2^n) input, energies AND gradient norms parity-checked
against a CPU-generated trace before anything is recorded, and timing
taken as the MARGINAL between two chain lengths to cancel the tunnel-RTT
constant.

The reference's HVA is models/hva.py (torch backprop through a
PennyLane CNOT-ladder circuit); its 3x3 experiment is
models/hva_for_3x3.py:373-392 (reps=10).  No reference-equivalent HVA
baseline has been measured, so vs_baseline is null; the recorded value
stands on its own as the on-chip iteration rate.

Writes benchmarks/tpu_result_hva.json (never consumed by bench.py's
headline -- that stays the ADAPT step).
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

NX = int(os.environ.get("QSFH_HVA_NX", "3"))
NY = int(os.environ.get("QSFH_HVA_NY", "3"))
REPS = int(os.environ.get("QSFH_HVA_REPS", "10"))
K1 = int(os.environ.get("QSFH_HVA_K1", "1"))
K2 = int(os.environ.get("QSFH_HVA_K2", "3"))
N_QUBITS = 2 * NX * NY
_SUFFIX = "" if (NX, NY) == (3, 3) else f"_{N_QUBITS}q"
EXPECTED_PATH = os.path.join(HERE, f"step_hva_expected{_SUFFIX}.json")
RESULT_NAME = f"tpu_result_hva{_SUFFIX}.json"
SALT = float(os.environ.get("QSFH_BENCH_SALT", "0") or 0)


def build_multi_step():
    import jax
    import jax.numpy as jnp

    from qsfh_tpu.algos.hva import HVA, flatten_hva_params

    n_e = NX * NY
    vqe = HVA(
        n_epoch=0, reps=REPS, lr=1e-2,
        x_dimension=NX, y_dimension=NY, n_electrons=n_e,
        n_spin_up=(n_e + 1) // 2, n_spin_down=n_e - (n_e + 1) // 2,
        tunneling=1.0, coulomb=6.0, ground_truth=False, plot=False,
        log_metrics=False, circuit_mode="split",
    )
    raw = vqe._step.raw_stages
    optimizer = vqe.optimizer

    # small deterministic nonzero init: zero angles can sit on symmetry
    # saddles where the gradient-norm parity check degenerates
    rng = np.random.default_rng(11)
    rdt = np.dtype(np.asarray(vqe.params["theta_U"]).dtype)
    params0 = {
        k: rng.normal(0, 0.05, np.asarray(v).shape).astype(rdt)
        for k, v in vqe.params.items()
    }
    psi0 = np.asarray(vqe._psi0_reim, dtype=rdt)

    def one_step(psi0_r, carry):
        p, o = carry
        flat = flatten_hva_params(p)
        psi_r = raw["fwd_from"](psi0_r, flat)
        e = raw["energy"](psi_r)
        lam_r = raw["cotangent"](psi_r)
        g = raw["adjoint"](psi_r, lam_r, flat)
        sz, s2, fid = raw["metrics"](psi_r)
        p, o, gn = raw["update"](flat, g, p, o)
        # the salt constant keeps every retry's program hash fresh while
        # staying numerically invisible (f32 rounds away 1e-30)
        return (p, o), (e, sz, s2, fid, gn + SALT * 1e-30)

    def multi(psi0_r, p, k):
        carry, ys = (p, optimizer.init(p)), []
        for _ in range(k):  # UNROLLED: scan-over-pallas compiles ~150 s
            carry, y = one_step(psi0_r, carry)
            ys.append(y)
        p, o = carry
        traj = tuple(jnp.stack(col) for col in zip(*ys))
        return p, o, traj

    jpsi0 = jnp.asarray(psi0)
    jp0 = {k: jnp.asarray(v) for k, v in params0.items()}

    def make(k):
        def prog():
            p0, p = jax.lax.optimization_barrier((jpsi0, jp0))
            return multi(p0, p, k)
        return jax.jit(prog)

    return {k: make(k) for k in (K1, K2)}


def run_chain(progs, k):
    t0 = time.time()
    p, o, traj = progs[k]()
    energies = np.asarray(traj[0])  # fetch proves the whole chain executed
    return time.time() - t0, energies, np.asarray(traj[4])


def main() -> int:
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu" or "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    platform = jax.devices()[0].platform
    on_cpu = platform == "cpu"
    if on_cpu and not os.environ.get("QSFH_PROFILE_ALLOW_CPU"):
        print("tpu_step_hva: no TPU platform; refusing to record", file=sys.stderr)
        return 1

    t0 = time.time()
    progs = build_multi_step()
    print(f"[hva +{time.time()-t0:6.1f}s] built", file=sys.stderr, flush=True)

    for k in (K1, K2):
        dt, energies, gnorms = run_chain(progs, k)
        print(
            f"[hva +{time.time()-t0:6.1f}s] K={k} first call {dt:.1f}s "
            f"E={energies.tolist()}", file=sys.stderr, flush=True,
        )

    _, energies, gnorms = run_chain(progs, K2)
    if on_cpu:
        with open(EXPECTED_PATH, "w") as f:
            json.dump({"energies": energies.tolist(), "gnorms": gnorms.tolist()}, f)
        print("wrote expected trace (CPU)", file=sys.stderr)
    else:
        if not os.path.exists(EXPECTED_PATH):
            print("no expected trace; run once with JAX_PLATFORMS=cpu "
                  "QSFH_PROFILE_ALLOW_CPU=1 first", file=sys.stderr)
            return 1
        exp = json.load(open(EXPECTED_PATH))
        ref_e = np.asarray(exp["energies"])
        ref_g = np.asarray(exp["gnorms"])
        err = float(np.max(np.abs(energies - ref_e) / np.maximum(np.abs(ref_e), 1e-9)))
        gerr = float(np.max(np.abs(gnorms - ref_g) / np.maximum(np.abs(ref_g), 1e-9)))
        print(f"[hva] max rel err vs CPU trace: energy {err:.2e} gnorm {gerr:.2e}",
              file=sys.stderr, flush=True)
        if err > 1e-3 or gerr > 1e-2:
            print("tpu_step_hva: PARITY FAIL; not recording", file=sys.stderr)
            return 1

    ts = {}
    for k in (K1, K2):
        samples = [run_chain(progs, k)[0] for _ in range(3)]
        ts[k] = float(np.median(samples))
    marginal = (ts[K2] - ts[K1]) / (K2 - K1)
    print(f"[hva] t({K2})={ts[K2]:.3f}s t({K1})={ts[K1]:.3f}s "
          f"-> {marginal*1e3:.1f} ms/iter", file=sys.stderr, flush=True)
    if marginal <= 0:
        marginal = ts[K2] / K2
        print(f"[hva] marginal invalid; upper bound {marginal*1e3:.1f} ms/iter",
              file=sys.stderr)

    blob = {
        "metric": f"hva_train_step_{N_QUBITS}q_reps{REPS}_iters_per_sec",
        "value": round(1.0 / marginal, 3),
        "unit": "iters/sec",
        "vs_baseline": None,
        "how": (
            f"single fused jit: {K2} UNROLLED full HVA train steps "
            "(fwd+energy+cotangent+adjoint+metrics+update), marginal "
            f"between chain lengths {K1}/{K2}, energies and gradient norms "
            "parity-checked vs CPU trace"
        ),
        "platform": str(jax.devices()[0]),
    }
    dest = HERE if not on_cpu else "/tmp"
    with open(os.path.join(dest, RESULT_NAME), "w") as f:
        json.dump(blob, f)
    print("tpu_step_hva:", json.dumps(blob))
    return 0


if __name__ == "__main__":
    sys.exit(main())
