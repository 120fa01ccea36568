#!/usr/bin/env python
"""Real-time dynamics demo: 2x2 Hubbard Neel quench.

Double occupancy D(t) = <U n_up n_down>/U after quenching the Neel
product state under H(t=1, U=4), Strang-Trotterized at dt=0.02, overlaid
on the exact dense propagation (eigendecomposition of the 256-dim H).
The reference framework has no time-dynamics capability at all.
"""
import os, sys, json
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
os.chdir(HERE)

import numpy as np
import jax.numpy as jnp

from qsfh_tpu.algos.base import HubbardProblem
from qsfh_tpu.algos.dynamics import TrotterEvolution, neel_occupied
from qsfh_tpu.engine.expectation import Observable
from qsfh_tpu.engine.state import basis_state
from qsfh_tpu.ops.jw import jordan_wigner
from qsfh_tpu.utils.dense import paulisum_to_dense

p = HubbardProblem(2, 2, 1.0, 4.0, 4, 2, 2, results_root=HERE)
U = p.coulomb
psi0 = np.asarray(basis_state(8, neel_occupied(2, 2), dtype=jnp.complex128))

dt, T = 0.02, 6.0
n_steps = int(round(T / dt))
obs = {"H": p.observables["H"],
       "UD": Observable(jordan_wigner(p.interacting_term), 8)}
ev = TrotterEvolution(p, dt=dt, order=2, dtype=jnp.complex128)
psi_f, rec = ev.evolve(psi0, n_steps, obs)
times = (np.arange(n_steps) + 1) * dt

# exact propagation via one eigendecomposition
h = paulisum_to_dense(p.qubit_hamiltonian, 8)
ud = paulisum_to_dense(jordan_wigner(p.interacting_term), 8)
evals, evecs = np.linalg.eigh(h)
c0 = evecs.conj().T @ psi0
exact_ud = np.array([
    ((evecs @ (np.exp(-1j * evals * t) * c0)).conj()
     @ ud @ (evecs @ (np.exp(-1j * evals * t) * c0))).real
    for t in times
])

err = np.abs(rec["UD"] - exact_ud)
summary = {
    "config": "2x2 t=1 U=4, Neel quench, Strang dt=0.02, T=6",
    "max_abs_error_D": float(err.max() / U),
    "final_D_trotter": float(rec["UD"][-1] / U),
    "final_D_exact": float(exact_ud[-1] / U),
    "energy_drift_final": float(rec["H"][-1]),  # exact value is 0
    "final_fidelity_note": "see tests/test_dynamics.py for the fidelity golden",
}
with open("summary.json", "w") as fh:
    json.dump(summary, fh, indent=1)
print(json.dumps(summary, indent=1))

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

fig, ax = plt.subplots(figsize=(6.0, 3.8))
ax.plot(times, exact_ud / U, color="#8a8a8a", lw=2.5, label="exact (dense)")
ax.plot(times, rec["UD"] / U, color="#3a5ced", lw=1.2, label="Trotter dt=0.02")
ax.set_xlabel("time (1/t)")
ax.set_ylabel("double occupancy per U")
ax.set_title("2x2 Hubbard Neel quench: D(t), Strang vs exact")
ax.legend(loc="lower right", fontsize=9, frameon=False)
ax.spines[["top", "right"]].set_visible(False)
fig.tight_layout()
fig.savefig("quench.png", dpi=140)
print("wrote quench.png")
