#!/usr/bin/env python
"""ITE polish of the trained 3x3 ADAPT state (18 qubits).

Starts imaginary-time evolution FROM the converged ADAPT checkpoint
(fidelity ~0.9998): the flow strips the residual excited-state weight and
relaxes into the degenerate ground manifold, demonstrating ITE as a
variational-state polisher and cross-validating the flagship energy
without touching the ED cache during the run (ED is only read at the end
for the error report).  Writes benchmarks/demo_3x3/ite_polish.json.
"""
import os, sys, json, time
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

DEMO = os.path.join(HERE, "demo_3x3")
os.chdir(DEMO)

from qsfh_tpu.algos.adapt import ADAPT
from qsfh_tpu.algos.ite import ImaginaryTimeEvolution
from qsfh_tpu.engine.state import subspace_fidelity

vqe = ADAPT(
    n_epoch=0, threshold1=1e-3, threshold2=1e-3,
    x_dimension=3, y_dimension=3, n_electrons=9, n_spin_up=5, n_spin_down=4,
    tunneling=1, coulomb=6, degenerate_subspace=4,
    load_model=True, results_root=DEMO, plot=False, log_metrics=False,
)
psi = np.asarray(vqe.state())
ite = ImaginaryTimeEvolution(vqe.problem, dbeta=0.02, order=4, dtype=jnp.complex128)

t0 = time.time()
psi_f, rec = ite.run(psi, n_steps=1500, block=25, variance_tol=1e-9, verbose=True)
wall = time.time() - t0

e0, manifold = vqe.problem.ground_state(degenerate=True, n_states=4)
fid0 = float(subspace_fidelity(jnp.asarray(psi), [jnp.asarray(m) for m in manifold]))
fid1 = float(subspace_fidelity(jnp.asarray(psi_f), [jnp.asarray(m) for m in manifold]))
e_start = float(rec["energies"][0])
e_final = float(rec["energies"][-1])

summary = {
    "config": "3x3 t=1 U=6, 5up/4dn; ITE (dbeta=0.02, order=4) from the ADAPT checkpoint",
    "steps": int(len(rec["energies"])),
    "beta_reached": round(len(rec["energies"]) * ite.dbeta, 3),
    "wall_seconds": round(wall, 1),
    "energy_start": round(e_start, 9),
    "energy_final": round(e_final, 9),
    "energy_exact": round(float(e0), 9),
    "error_start_mHa": round((e_start - float(e0)) * 1000, 4),
    "error_final_mHa": round((e_final - float(e0)) * 1000, 4),
    "variance_final": float(rec["variances"][-1]),
    "manifold_fidelity_start": round(fid0, 8),
    "manifold_fidelity_final": round(fid1, 8),
    "trace_every_25": [round(float(e), 8) for e in rec["energies"][::25]],
}
with open(os.path.join(DEMO, "ite_polish.json"), "w") as fh:
    json.dump(summary, fh, indent=1)
print(json.dumps({k: v for k, v in summary.items() if k != "trace_every_25"}, indent=1))
