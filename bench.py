#!/usr/bin/env python
"""Benchmark: fused ADAPT-VQE train step at 18 qubits (3x3 Hubbard).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value     = ADAPT train-step iterations/sec (energy + Sz + S^2 + gradient +
            Adam update, 12-operator ansatz, Givens FT network included) on
            the default JAX backend (TPU under axon, else CPU).
baseline  = the reference-equivalent torch-CPU gate-by-gate step measured by
            benchmarks/reference_baseline.py on this host (the reference
            stack itself -- PennyLane default.qubit.torch backprop -- is not
            installable here; the emulation reproduces its per-iteration
            structure: one tensor op per gate of the PauliStringRotation
            decomposition, per-term Hamiltonian expectation, backprop).
vs_baseline = value / baseline_iters_per_sec  (higher is better).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _log(msg, _t0=[None]):
    now = time.time()
    if _t0[0] is None:
        _t0[0] = now
    print(f"[bench +{now - _t0[0]:7.1f}s] {msg}", file=sys.stderr, flush=True)

NX, NY = 3, 3
N_ANSATZ = 12
WARMUP = 2
ITERS = 5


def main():
    import jax
    import jax.numpy as jnp
    import optax

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)

    from qsfh_tpu.algos.adapt import ADAPT

    _log("imports done")
    n_e = NX * NY
    n_up = (n_e + 1) // 2
    vqe = ADAPT(
        n_epoch=0,
        threshold1=1e-2,
        threshold2=1e-2,
        x_dimension=NX,
        y_dimension=NY,
        n_electrons=n_e,
        n_spin_up=n_up,
        n_spin_down=n_e - n_up,
        tunneling=1.0,
        coulomb=6.0,
        ground_truth=False,
        plot=False,
        log_metrics=False,
    )
    _log("ADAPT built (pool + problem)")
    indices = tuple(range(N_ANSATZ))
    vqe.selected_indices = list(indices)
    vqe.params_t = jnp.full(N_ANSATZ, 0.05, dtype=vqe._rdt)

    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(vqe.params_t)
    step = vqe._build_step(indices, optimizer)

    params, state = vqe.params_t, opt_state
    for w in range(WARMUP):
        params, state, e, sz, s2, fid, gn = step(params, state)
        float(e)
        _log(f"warmup {w} done (first includes compile)")

    times = []
    for _ in range(ITERS):
        t0 = time.time()
        params, state, e, sz, s2, fid, gn = step(params, state)
        float(e)  # forces full sync each iteration
        times.append(time.time() - t0)
        _log(f"iter {len(times)}: {times[-1]*1e3:.1f} ms")
    sec_per_iter = float(np.median(times))
    iters_per_sec = 1.0 / sec_per_iter

    baseline_path = os.path.join(here, "benchmarks", "baseline_measurements.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        data = json.load(open(baseline_path))
        entry = data.get(f"adapt_step_{2 * NX * NY}q")
        if entry:
            vs_baseline = iters_per_sec * entry["sec_per_iter"]

    print(
        json.dumps(
            {
                "metric": f"adapt_vqe_train_step_{2 * NX * NY}q_iters_per_sec",
                "value": round(iters_per_sec, 3),
                "unit": "iters/sec",
                "vs_baseline": round(vs_baseline, 1) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
