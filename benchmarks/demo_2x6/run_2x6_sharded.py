#!/usr/bin/env python
"""24-qubit (2x6 lattice) amplitude-sharded ADAPT training steps.

Beyond-reference-scale demo: the reference tops out at 18 qubits (3x3,
/root/reference/models/adapt_vqe_for_3x3.py:470-485) and delegates >=20
qubits to PennyLane-Lightning-GPU, which this image does not have at all.
Here the 2^24-amplitude statevector is sharded over an 8-device mesh
(virtual CPU devices standing in for a TPU slice; the sharding layout is
identical) and a full ADAPT train step -- ansatz, Givens FT network, energy,
adjoint gradient, Adam update -- executes with XOR-collective-permute
cross-shard gates and psum reductions.

Run:  PYTHONPATH=/root/repo python benchmarks/demo_2x6/run_2x6_sharded.py
"""

import json
import os
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
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
        x_dimension=2,
        y_dimension=6,
        tunneling=1.0,
        coulomb=6.0,
        n_electrons=12,
        n_spin_up=6,
        n_spin_down=6,
    )
    print(f"n_qubits = {p.n_qubits} (2^{p.n_qubits} amplitudes over {mesh.size} devices)")
    pool = [
        jordan_wigner(g)
        for g in hubbard_interaction_pool_simplified(2, 6)[:8]
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
        thetas, opt, e, gn = step(thetas, opt)
        e, gn = float(e), float(gn)
    compile_s = time.time() - t0
    print(f"compile + first step: {compile_s:.1f}s  energy={e:.6f}  gnorm={gn:.3e}")

    energies = [e]
    t0 = time.time()
    n_steps = 2
    with mesh:
        for _ in range(n_steps):
            thetas, opt, e, gn = step(thetas, opt)
        e, gn = float(e), float(gn)
    per_step = (time.time() - t0) / n_steps
    energies.append(e)
    print(f"steady state: {per_step:.1f}s/step  energy={e:.6f}  gnorm={gn:.3e}")
    assert energies[-1] < energies[0], "energy should decrease under Adam"

    out = {
        "n_qubits": p.n_qubits,
        "devices": mesh.size,
        "compile_plus_first_s": round(compile_s, 1),
        "steady_state_s_per_step": round(per_step, 2),
        "energy_first": energies[0],
        "energy_after_steps": energies[-1],
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "result.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
