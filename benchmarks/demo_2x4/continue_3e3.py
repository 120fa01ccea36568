#!/usr/bin/env python
"""Tightened continuation of the 2x4 demo (thresholds 3e-3, resume)."""
import json, os, sys
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
os.chdir(HERE)
from qsfh_tpu.algos.adapt import ADAPT

vqe = ADAPT(
    n_epoch=100, threshold1=3e-3, threshold2=3e-3,
    x_dimension=2, y_dimension=4, n_electrons=8, n_spin_up=4, n_spin_down=4,
    tunneling=1, coulomb=2, load_model=True,
    results_root=HERE, plot=True, log_metrics=True,
)
vqe.run()
e = vqe.results["epoch loss"][-1]
e0 = vqe.ground_state_energy
out = {
    "config": "2x4 t=1 U=2, tightened 3e-3 continuation",
    "epochs": len(vqe.results["epoch loss"]),
    "final_energy": e,
    "ed_energy": e0,
    "error_mHa": 1e3 * (e - e0),
    "fidelity": vqe.results["fidelity"][-1],
    "n_operators": len(vqe.selected_indices),
}
with open(os.path.join(HERE, "summary_3e3.json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
