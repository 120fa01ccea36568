#!/usr/bin/env python
"""On-chip real-time dynamics benchmark: Trotter quench steps as ONE jit.

K Strang steps of the 3x3 (18-qubit) Neel quench UNROLLED inside a single
salted program, |psi0> fed as a host (2, 2^n) real input (traced basis
one-hots cost the remote compile service ~120 s), energy + double
occupancy parity-gated against a CPU float trace, MARGINAL ms/step
between two chain lengths.  No reference baseline exists: the reference
framework has no time-dynamics capability at all (vs_baseline null).

CPU trace generation:
    JAX_PLATFORMS=cpu QSFH_PROFILE_ALLOW_CPU=1 python benchmarks/tpu_dynamics.py
Env knobs: QSFH_DYN_NX/NY/DT/K1/K2, QSFH_BENCH_SALT.
"""
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))
sys.path.insert(0, HERE)

import numpy as np

NX = int(os.environ.get("QSFH_DYN_NX", "3"))
NY = int(os.environ.get("QSFH_DYN_NY", "3"))
DT = float(os.environ.get("QSFH_DYN_DT", "0.05"))
K1 = int(os.environ.get("QSFH_DYN_K1", "5"))
K2 = int(os.environ.get("QSFH_DYN_K2", "15"))
N_QUBITS = 2 * NX * NY
_SUFFIX = "" if (NX, NY) == (3, 3) else f"_{N_QUBITS}q"
EXPECTED_PATH = os.path.join(HERE, f"dynamics_expected{_SUFFIX}.json")
RESULT_NAME = f"tpu_dynamics{_SUFFIX}.json"
SALT = float(os.environ.get("QSFH_BENCH_SALT", "0") or 0)


def build_progs():
    import jax
    import jax.numpy as jnp

    from qsfh_tpu.algos.base import HubbardProblem, default_dtype
    from qsfh_tpu.algos.dynamics import TrotterEvolution, neel_occupied
    from qsfh_tpu.engine.expectation import Observable
    from qsfh_tpu.engine.state import basis_state, from_reim, to_reim_host
    from qsfh_tpu.ops.jw import jordan_wigner

    dtype = default_dtype()
    n_e = NX * NY
    problem = HubbardProblem(
        NX, NY, 1.0, 4.0, n_e, (n_e + 1) // 2, n_e - (n_e + 1) // 2,
        results_root="/tmp/qsfh_dyn_results",
    )
    ev = TrotterEvolution(problem, dt=DT, order=2, dtype=dtype)
    h_obs = problem.observables["H"]
    ud_obs = Observable(jordan_wigner(problem.interacting_term), N_QUBITS)

    # host-built Neel state, fed as a (2, 2^n) real input
    with jax.default_device(jax.devices("cpu")[0]):
        psi0_c = basis_state(N_QUBITS, neel_occupied(NX, NY), dtype=dtype)
    psi0_r = np.asarray(to_reim_host(np.asarray(psi0_c), dtype))

    def multi(psi_r, k):
        psi = from_reim(psi_r, dtype)
        uds, es = [], []
        for _ in range(k):  # UNROLLED (scan-over-pallas compiles slowly)
            psi = ev.step(psi)
            # UD is the O(1) parity observable (relative 1e-3 meaningful);
            # <H> is a pure cancellation residue for the Neel quench
            # (exact value 0) so it rides the loose sanity slot instead
            uds.append(ud_obs.expectation(psi) + SALT * 1e-30)
            es.append(h_obs.expectation(psi))
        return jnp.stack(uds), jnp.stack(es)

    def make(k):
        def prog(p):
            return multi(p, k)
        return jax.jit(prog)

    progs = {k: make(k) for k in (K1, K2)}
    feed = jnp.asarray(psi0_r)
    return progs, feed


def main() -> int:
    import jax

    from fused_harness import kernel_path_label, measure_fused_step

    if os.environ.get("JAX_PLATFORMS") == "cpu" or "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    if jax.devices()[0].platform == "cpu" and not os.environ.get(
        "QSFH_PROFILE_ALLOW_CPU"
    ):
        print("tpu_dynamics: no TPU platform; refusing to record", file=sys.stderr)
        return 1

    progs, feed = build_progs()

    def run_chain(k):
        t0 = time.time()
        uds, es = progs[k](feed)
        uds = np.asarray(uds)  # fetch proves the chain executed
        # "energies" slot = UD (O(1), tight relative gate); "gnorms" slot
        # = the <H> Trotter drift (a cancellation residue, loose sanity)
        return time.time() - t0, uds, np.asarray(es)

    config = {
        "nx": NX, "ny": NY, "dt": DT, "k1": K1, "k2": K2,
        "order": 2, "initial": "neel", "u": 4.0, "gate": "UD/Hdrift",
    }
    return measure_fused_step(
        name="tpu_dynamics",
        run_chain=run_chain,
        k1=K1,
        k2=K2,
        config=config,
        expected_path=EXPECTED_PATH,
        result_path=os.path.join(HERE, RESULT_NAME),
        metric=f"trotter_dynamics_{N_QUBITS}q_steps_per_sec",
        how=(
            f"{N_QUBITS}q Neel quench, Strang dt={DT}, K steps unrolled in one "
            f"salted jit, marginal between K={K1}/{K2}; kernel path: "
            + kernel_path_label(N_QUBITS)
        ),
        vs_baseline=None,
        e_tol=1e-3,  # double occupancy, O(1) relative
        g_tol=1.0,   # <H> drift: cancellation residue, sanity only
    )


if __name__ == "__main__":
    sys.exit(main())
