#!/usr/bin/env python
"""28-qubit (2x7 lattice) amplitude-sharded ADAPT training steps.

Extends the execution ladder 24q (demo_2x6) -> 26q (demo_1x13) -> 28
qubits: 2^28 amplitudes (2 GB per complex64 statevector) sharded over the
8-device virtual mesh, full ADAPT train step with XOR-collective-permute
cross-shard gates.  result.json is written after EVERY step so a
wall-clock cutoff still leaves the largest completed proof on disk.
Pool ops 3..5 are used (the first momentum ops sit on a symmetry plateau
at the shifted point; see demo_1x13).  Reference ceiling: 18q practical
(/root/reference/models/adapt_vqe.py:299-304).

Run:  PYTHONPATH=/root/repo nice -n 5 python benchmarks/demo_2x7/run_2x7_sharded.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # 8 virtual devices timeshare ONE core: shards take tens of minutes to
    # reach each collective, far past the 40 s default rendezvous kill
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=14400"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=28800"
    + " --xla_cpu_collective_timeout_seconds=28800"
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))


def record(out):
    with open(os.path.join(HERE, "result.json"), "w") as f:
        json.dump(out, f, indent=1)


def main():
    from qsfh_tpu.algos.base import HubbardProblem
    from qsfh_tpu.ops.jw import jordan_wigner
    from qsfh_tpu.ops.pool import hubbard_interaction_pool_simplified
    from qsfh_tpu.parallel import amplitude_mesh
    from qsfh_tpu.parallel.sharded_adapt import build_sharded_adapt_step

    mesh = amplitude_mesh(8)
    p = HubbardProblem(
        x_dimension=2,
        y_dimension=7,
        tunneling=1.0,
        coulomb=6.0,
        n_electrons=14,
        n_spin_up=7,
        n_spin_down=7,
    )
    print(
        f"n_qubits = {p.n_qubits} (2^{p.n_qubits} amplitudes over {mesh.size} devices)",
        flush=True,
    )
    pool = [
        jordan_wigner(g)
        for g in hubbard_interaction_pool_simplified(2, 7)[3:6]
    ]

    out = {"n_qubits": p.n_qubits, "devices": mesh.size, "steps_done": 0}
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
        thetas = thetas + 0.05
        import optax

        opt = optax.adam(1e-2).init(thetas)
        thetas, opt, e0, gn0 = step(thetas, opt)
        e0, gn0 = float(e0), float(gn0)
    out.update(
        steps_done=1,
        compile_plus_first_s=round(time.time() - t0, 1),
        energy_first=e0,
        gnorm_first=gn0,
    )
    record(out)
    print(
        f"compile + first step: {out['compile_plus_first_s']}s "
        f"energy={e0:.6f} gnorm={gn0:.3e}",
        flush=True,
    )

    t1 = time.time()
    with mesh:
        thetas, opt, e1, gn1 = step(thetas, opt)
        e1, gn1 = float(e1), float(gn1)
    out.update(
        steps_done=2,
        second_step_s=round(time.time() - t1, 1),
        energy_second=e1,
        gnorm_second=gn1,
    )
    record(out)
    print(
        f"step 2: {out['second_step_s']}s energy={e1:.6f} gnorm={gn1:.3e}",
        flush=True,
    )
    assert e1 <= e0 + 1e-4, f"energy increased: {e0} -> {e1}"
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
