#!/usr/bin/env python
"""26-qubit (1x13 lattice) amplitude-sharded ADAPT training steps.

Extends the 24-qubit execution proof (benchmarks/demo_2x6) to 26 qubits —
2^26 amplitudes sharded over the 8-device mesh, full ADAPT train step
(ansatz, Givens FT network, energy, adjoint gradient, Adam update) with
XOR-collective-permute cross-shard gates.  The 32-qubit (4x4) program is
separately proven to lower + compile at constant size
(benchmarks/demo_4x4_compile.json); execution at that size needs a real
multi-chip slice.  Reference ceiling: 18 qubits practical
(/root/reference/models/adapt_vqe.py:299-304).

Run:  PYTHONPATH=/root/repo python benchmarks/demo_1x13/run_1x13_sharded.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # 8 virtual devices timeshare ONE physical core: a 2^23-amplitude shard
    # takes minutes to reach each collective, far past the default 40 s
    # rendezvous termination
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=3600"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
    + " --xla_cpu_collective_timeout_seconds=7200"
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def main():
    from qsfh_tpu.algos.base import HubbardProblem
    from qsfh_tpu.ops.jw import jordan_wigner
    from qsfh_tpu.ops.pool import hubbard_interaction_pool_simplified
    from qsfh_tpu.parallel import amplitude_mesh
    from qsfh_tpu.parallel.sharded_adapt import build_sharded_adapt_step

    mesh = amplitude_mesh(8)
    p = HubbardProblem(
        x_dimension=1,
        y_dimension=13,
        tunneling=1.0,
        coulomb=6.0,
        n_electrons=13,
        n_spin_up=7,
        n_spin_down=6,
    )
    print(f"n_qubits = {p.n_qubits} (2^{p.n_qubits} amplitudes over {mesh.size} devices)", flush=True)
    pool = [
        jordan_wigner(g)
        for g in hubbard_interaction_pool_simplified(1, 13)[:3]
    ]

    t0 = time.time()
    with mesh:
        step, thetas, opt = build_sharded_adapt_step(
            p,
            [g.rotation_terms() for g in pool],
            list(range(len(pool))),
            mesh,
            dtype=jnp.complex64,
            lr=1e-2,
        )
        thetas = thetas + 0.05  # off the zero-gradient point
        import optax

        opt = optax.adam(1e-2).init(thetas)
        thetas, opt, e0, gn0 = step(thetas, opt)
        e0, gn0 = float(e0), float(gn0)
    compile_s = time.time() - t0
    print(f"compile + first step: {compile_s:.1f}s  energy={e0:.6f}  gnorm={gn0:.3e}", flush=True)

    t0 = time.time()
    with mesh:
        thetas, opt, e1, gn1 = step(thetas, opt)
        e1, gn1 = float(e1), float(gn1)
    per_step = time.time() - t0
    print(f"step 2: {per_step:.1f}s  energy={e1:.6f}  gnorm={gn1:.3e}", flush=True)
    # the first-3 momentum pool ops can sit on a symmetry plateau at the
    # shifted point (gnorm ~ 1e-9 observed); Adam's normalized update still
    # moves, but monotone descent is only guaranteed off the plateau
    assert e1 <= e0 + 1e-4, f"energy increased: {e0} -> {e1}"

    out = {
        "n_qubits": p.n_qubits,
        "devices": mesh.size,
        "compile_plus_first_s": round(compile_s, 1),
        "second_step_s": round(per_step, 1),
        "energy_first": e0,
        "energy_second": e1,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "result.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
