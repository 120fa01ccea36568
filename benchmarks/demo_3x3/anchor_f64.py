#!/usr/bin/env python
"""Float64 re-anchor for the on-chip 3x3 flagship run.

The chip trains in complex64 (TPU rejects c128); its logged energies
carry a ~1e-6 relative noise floor.  This script loads the latest
epoch-boundary checkpoint on CPU in float64, recomputes energy /
gradient norm / manifold fidelity exactly, and appends one line to
``anchors.jsonl`` -- the convergence numbers that can be trusted below
the c64 floor.  Run after each epoch (the on-chip driver forks it
asynchronously).
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from qsfh_tpu.algos.adapt import ADAPT  # noqa: E402
from qsfh_tpu.ops.pool import hubbard_interaction_pool_extended  # noqa: E402


def main():
    vqe = ADAPT(
        n_epoch=0, threshold1=1e-3, threshold2=1e-3,
        x_dimension=3, y_dimension=3, n_electrons=9, n_spin_up=5,
        n_spin_down=4, tunneling=1, coulomb=6, degenerate_subspace=4,
        # extended pool: simplified prefix keeps pre-growth checkpoints
        # valid, and growth-phase checkpoints select past index 323
        pool=hubbard_interaction_pool_extended(3, 3),
        load_model=True, results_root=HERE, plot=False, log_metrics=False,
    )
    import optax

    step = vqe._build_step(tuple(vqe.selected_indices), optax.adam(1e-3))
    raw = step.raw_stages
    from qsfh_tpu.algos.adapt_fused import initial_state_reim

    psi0 = initial_state_reim(vqe)
    th = np.asarray(vqe.params_t, dtype=np.float64)
    psi_r = raw["fwd_from"](psi0, th)
    e = float(raw["energy"](psi_r))
    lam = raw["cotangent"](psi_r)
    g = np.asarray(raw["adjoint"](psi_r, lam, th))
    sz, s2, fid = (float(x) for x in raw["metrics"](psi_r))
    line = {
        "time": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "epoch": len(vqe.results["epoch loss"]),
        "n_params": len(vqe.selected_indices),
        "energy_f64": e,
        "ed_energy": float(vqe.ground_state_energy),
        "gap_ha": e - float(vqe.ground_state_energy),
        "grad_norm_f64": float(np.linalg.norm(g)),
        "fidelity_f64": fid,
        "Sz_f64": sz,
        "S2_f64": s2,
    }
    with open(os.path.join(HERE, "anchors.jsonl"), "a") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps(line))


if __name__ == "__main__":
    main()
