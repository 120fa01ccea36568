#!/usr/bin/env python
"""Collective-op census of the sharded ADAPT train step, 12 -> 32 qubits.

The amplitude-sharded design claims cross-device traffic scales with the
number of SHARD-CROSSING gates (generators whose flip masks touch the
device bits), not with 2^n: shard-local XOR flips stay on-device, and the
scan-compiled lowering keeps the program size constant in depth
(parallel/sharded_adapt.py).  This script compiles the step on the
virtual 8-device mesh at several lattice sizes and counts the XLA
collectives in the optimized HLO (collective-permute / all-reduce /
all-gather / reduce-scatter), plus the per-collective shard payload --
the communication-volume side of the 32-qubit compile proof
(benchmarks/demo_4x4_compile.json, tests/test_4x4_compile.py).

Runs entirely on CPU (no TPU window needed); writes
benchmarks/collective_census.json.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from qsfh_tpu.algos.base import HubbardProblem  # noqa: E402
from qsfh_tpu.ops.jw import jordan_wigner  # noqa: E402
from qsfh_tpu.ops.pool import hubbard_interaction_pool_simplified  # noqa: E402
from qsfh_tpu.parallel import amplitude_mesh  # noqa: E402
from qsfh_tpu.parallel.sharded_adapt import build_sharded_adapt_step  # noqa: E402

COLLECTIVES = ("collective-permute", "all-reduce", "all-gather", "reduce-scatter")


def census(x: int, y: int, n_pool: int = 2) -> dict:
    n_sites = x * y
    n = 2 * n_sites
    problem = HubbardProblem(
        x, y, 1.0, 6.0, n_sites, (n_sites + 1) // 2, n_sites // 2
    )
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
        hlo = step.lower(thetas, opt_state).compile().as_text()
    counts = {
        op: len(re.findall(rf"\b{op}(?:-(?:start|done))?\(", hlo))
        for op in COLLECTIVES
    }
    # each permuted operand is one (2^n / 8)-amplitude f32 plane slice
    shard_mb = (1 << n) / 8 * 4 / 2**20
    return {
        "lattice": f"{x}x{y}",
        "n_qubits": n,
        "hlo_bytes": len(hlo),
        "collectives": counts,
        "collective_permute_payload_MB_per_plane": round(shard_mb, 3),
        "compile_s": round(time.time() - t0, 1),
    }


def main() -> int:
    sizes = [(2, 3), (2, 6), (2, 7), (4, 4)]
    rows = []
    for x, y in sizes:
        row = census(x, y)
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(os.path.join(HERE, "collective_census.json"), "w") as f:
            json.dump(rows, f, indent=1)
    small, big = rows[0], rows[-1]
    print(
        f"HLO growth 12q->32q: {big['hlo_bytes']/small['hlo_bytes']:.2f}x; "
        f"permutes {small['collectives']['collective-permute']} -> "
        f"{big['collectives']['collective-permute']}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
