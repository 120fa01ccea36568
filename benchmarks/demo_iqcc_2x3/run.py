#!/usr/bin/env python
"""iQCC-Hubbard on the 2x3 lattice (12 qubits) with the term-growth cap.

The BASELINE tracked config: dressed-Hamiltonian regeneration at a scale
where the packed-Pauli growth is nontrivial (4^12 possible strings), with
``max_terms`` exercised, against dense ED ground truth.
"""
import json, os, sys
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
os.chdir(HERE)
from qsfh_tpu.algos.iqcc import IQCC
from qsfh_tpu.ops.lattice import fermi_hubbard

vqe = IQCC(
    hamiltonian=fermi_hubbard(2, 3, 1.0, 4.0, periodic=True, spinless=False),
    n_epoch=40,
    lr=1e-2,
    threshold=5e-3,
    max_terms=20000,
    ground_truth=True,
    results_root=os.path.join(HERE, "results"),
    tag="IQCC-hubbard-2x3",
    plot=True,
    log_metrics=True,
)
hist = vqe.run()
out = {
    "config": "2x3 t=1 U=4 periodic, max_terms=20000",
    "epochs": len(hist["epoch"]),
    "iterations": len(hist["iteration"]),
    "final_energy": hist["epoch"][-1],
    "exact_energy": vqe.ground_state_energy,
    "error_mHa": 1e3 * (hist["epoch"][-1] - vqe.ground_state_energy),
    "dressed_terms_final": len(vqe.current_hamiltonian),
}
with open(os.path.join(HERE, "summary.json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
