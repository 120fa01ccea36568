#!/usr/bin/env python
"""Momentum distribution and pairing correlations of the trained 3x3 state.

Extends benchmarks/correlations_3x3.py (spin structure factor) with the
one-body observables: n(k) from the one-body density matrix per spin, and
the on-site pair correlator (double occupancy + its off-diagonal decay).
Exact values come from the state's own ground-manifold projection.
Writes benchmarks/demo_3x3/observables.json.
"""
import os, sys, json
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from qsfh_tpu.ops.correlations import (
    momentum_distribution,
    one_body_density_matrix,
    pair_correlation_matrix,
)
from qsfh_tpu.ops.entanglement import entanglement_entropy, site_qubits

DEMO = os.path.join(HERE, "demo_3x3")
os.chdir(DEMO)

from qsfh_tpu.algos.adapt import ADAPT

vqe = ADAPT(
    n_epoch=0, threshold1=1e-3, threshold2=1e-3,
    x_dimension=3, y_dimension=3, n_electrons=9, n_spin_up=5, n_spin_down=4,
    tunneling=1, coulomb=6, degenerate_subspace=4,
    load_model=True, results_root=DEMO, plot=False, log_metrics=False,
)
psi = np.asarray(vqe.state())
_, manifold = vqe.problem.ground_state(degenerate=True, n_states=4)
target = sum(complex(np.vdot(m, psi)) * np.asarray(m) for m in manifold)
target /= np.linalg.norm(target)

out = {}
for name, state in [("exact_manifold_projection", target), ("adapt_trained", psi)]:
    entry = {}
    for spin, count in (("up", 5), ("down", 4)):
        rho = one_body_density_matrix(state, 9, spin=spin)
        nk = momentum_distribution(rho, 3, 3)
        entry[f"n_k_{spin}"] = {f"({kx},{ky})": round(v, 6) for (kx, ky), v in sorted(nk.items())}
        entry[f"trace_rho_{spin}"] = round(float(np.trace(rho).real), 6)
        assert abs(np.trace(rho).real - count) < 1e-6, (spin, np.trace(rho))
    pair = pair_correlation_matrix(state, 9)
    entry["double_occupancy"] = round(float(np.mean(np.diag(pair).real)), 6)
    entry["pair_nn"] = round(float(abs(pair[0, 1])), 6)
    entry["pair_max_offsite"] = round(
        float(np.abs(pair - np.diag(np.diag(pair))).max()), 6
    )
    # bipartite entanglement across the column cut (sites {0,1,2} = x=0..2
    # of row 0? row-major: first 3 sites are row y=0) and one-site entropy
    entry["entropy_row0"] = round(entanglement_entropy(state, 18, site_qubits((0, 1, 2))), 6)
    entry["entropy_site0"] = round(entanglement_entropy(state, 18, site_qubits((0,))), 6)
    out[name] = entry

summary = {
    "config": "3x3 t=1 U=6, 5up/4dn; ADAPT demo checkpoint (iter snapshot)",
    **out,
    "note": "n(k) per spin (sum rule = electron counts) and on-site pairing "
            "correlator of the trained state vs its manifold projection; "
            "repulsive U keeps pairing short-ranged.",
}
path = os.path.join(DEMO, "observables.json")
with open(path, "w") as fh:
    json.dump(summary, fh, indent=1)
print(json.dumps(summary, indent=1))
