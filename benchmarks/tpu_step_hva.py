#!/usr/bin/env python
"""On-chip HVA train step, measured as ONE fused multi-iteration program.

Same methodology as benchmarks/tpu_step_fused.py (the ADAPT flagship
measurement; shared protocol in benchmarks/fused_harness.py): HVA's raw
split stages (algos/hva.py step.raw_stages) are composed into a single
salted jit with K iterations UNROLLED, |psi0> fed as a host (2, 2^n)
input, energies AND gradient norms parity-checked against a
CPU-generated trace before anything is recorded, and timing taken as the
MARGINAL between two chain lengths to cancel the tunnel-RTT constant.

The reference's HVA is models/hva.py (torch backprop through a
PennyLane CNOT-ladder circuit); its 3x3 experiment is
models/hva_for_3x3.py:373-392 (reps=10).  No reference-equivalent HVA
baseline has been measured, so vs_baseline is null; the recorded value
stands on its own as the on-chip iteration rate.

Writes benchmarks/tpu_result_hva.json (never consumed by bench.py's
headline -- that stays the ADAPT step).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, HERE)  # fused_harness, when loaded as a module

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

    from fused_harness import kernel_path_label, measure_fused_step

    if os.environ.get("JAX_PLATFORMS") == "cpu" or "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    if jax.devices()[0].platform == "cpu" and not os.environ.get(
        "QSFH_PROFILE_ALLOW_CPU"
    ):
        print("tpu_step_hva: no TPU platform; refusing to record", file=sys.stderr)
        return 1

    t0 = time.time()
    progs = build_multi_step()
    print(f"[hva +{time.time()-t0:6.1f}s] built", file=sys.stderr, flush=True)

    return measure_fused_step(
        name="tpu_step_hva",
        run_chain=lambda k: run_chain(progs, k),
        k1=K1,
        k2=K2,
        config={"nx": NX, "ny": NY, "reps": REPS, "k1": K1, "k2": K2},
        expected_path=EXPECTED_PATH,
        result_path=os.path.join(HERE, RESULT_NAME),
        metric=f"hva_train_step_{N_QUBITS}q_reps{REPS}_iters_per_sec",
        how=(
            f"single fused jit: {K2} UNROLLED full HVA train steps "
            "(fwd+energy+cotangent+adjoint+metrics+update, "
            f"{kernel_path_label(N_QUBITS)} kernels), marginal between "
            f"chain lengths {K1}/{K2}, energies and gradient norms "
            "parity-checked vs CPU trace"
        ),
        vs_baseline=None,
    )


if __name__ == "__main__":
    sys.exit(main())
