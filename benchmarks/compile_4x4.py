#!/usr/bin/env python
"""AOT-compile the 4x4 = 32-qubit sharded ADAPT step (VERDICT #4).

The reference's practical ceiling is 18 qubits (backend switch at 20,
/root/reference/models/adapt_vqe.py:299-304); the 4x4 lattice (32 qubits,
2^32 amplitudes = 32 GiB c64) is this framework's north-star capability via
amplitude sharding.  This script proves the PROGRAM: on the virtual
8-device mesh, `jax.jit(...).lower(...).compile()` the full sharded ADAPT
train step (scan lowering, adjoint gradient) at 4x4 and record HLO program
size next to the 2x3 (12-qubit) program -- the scan lowering is
constant-size in n_qubits, so the two must be within a small factor.

Execution at 4x4 needs a real v5e-16 slice (8 x 4 GiB shards don't fit one
host's arithmetic throughput); the largest host-executed step is recorded
separately (benchmarks/demo_2x7, 28 qubits).

Writes benchmarks/demo_4x4_compile.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402


def measure(x, y, n_pool=3):
    from qsfh_tpu.algos.base import HubbardProblem
    from qsfh_tpu.ops.jw import jordan_wigner
    from qsfh_tpu.ops.pool import hubbard_interaction_pool_simplified
    from qsfh_tpu.parallel import amplitude_mesh
    from qsfh_tpu.parallel.sharded_adapt import build_sharded_adapt_step

    n_sites = x * y
    n_e = n_sites  # half filling
    problem = HubbardProblem(x, y, 1.0, 6.0, n_e, (n_e + 1) // 2, n_e // 2)
    pool_rot = [
        jordan_wigner(g).rotation_terms()
        for g in hubbard_interaction_pool_simplified(x, y)[:n_pool]
    ]
    mesh = amplitude_mesh(8)
    t0 = time.time()
    with mesh:
        step, thetas, opt_state = build_sharded_adapt_step(
            problem, pool_rot, list(range(n_pool)), mesh,
            dtype=jnp.complex64, lr=1e-2,
        )
        build_s = time.time() - t0
        t0 = time.time()
        lowered = step.lower(thetas, opt_state)
        lower_s = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        compile_s = time.time() - t0
    hlo = compiled.as_text()
    return {
        "n_qubits": 2 * n_sites,
        "build_s": round(build_s, 1),
        "lower_s": round(lower_s, 1),
        "compile_s": round(compile_s, 1),
        "hlo_instructions": hlo.count("\n"),
        "hlo_bytes": len(hlo),
    }


def main():
    out = {
        "mesh": "8-device virtual CPU (amp axis)",
        "lowering": "scan + adjoint",
        "small": measure(2, 3),
        "flagship_4x4": measure(4, 4),
    }
    ratio = out["flagship_4x4"]["hlo_bytes"] / out["small"]["hlo_bytes"]
    out["hlo_size_ratio_32q_vs_12q"] = round(ratio, 2)
    with open(os.path.join(HERE, "demo_4x4_compile.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
