#!/usr/bin/env python
"""Single-particle spectral function of the 2x2 Hubbard model.

A(omega) from the retarded Green's function G^>(t) computed by real-time
Trotter evolution (algos/dynamics.py greens_function), peaks checked
against the exact electron-addition energies E_n(N+1) - E0(N) and
weights |<n| c^dag |gs>|^2 from dense diagonalization.  Spectroscopy is
a capability class the reference framework (ground states only) cannot
touch.
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
from qsfh_tpu.algos.dynamics import greens_function
from qsfh_tpu.ops.fermion import FermionOperator
from qsfh_tpu.ops.jw import jordan_wigner
from qsfh_tpu.utils.dense import paulisum_to_dense

p = HubbardProblem(2, 2, 1.0, 4.0, 4, 2, 2, results_root=HERE)
e0, gs = p.ground_state()
gs = np.asarray(gs)

dt, T, eta = 0.02, 80.0, 0.08
n_steps = int(round(T / dt))
times, g = greens_function(p, gs, e0, mode=0, dt=dt, n_steps=n_steps)

omegas = np.linspace(-1.0, 7.0, 1600)
# A(w) = (1/pi) Re int_0^inf dt e^{i(w)t - eta t} G(t)
phase = np.exp(1j * np.outer(omegas, times) - eta * times)
a_w = (phase @ g).real * dt / np.pi

# exact peak table from the dense (N+1)-sector spectrum
h = paulisum_to_dense(p.qubit_hamiltonian, 8)
cdag = paulisum_to_dense(jordan_wigner(FermionOperator(((0, 1),))), 8)
phi = cdag @ gs
evals, evecs = np.linalg.eigh(h)
w_n = np.abs(evecs.conj().T @ phi) ** 2
keep = w_n > 1e-6
peaks = sorted(zip((evals - e0)[keep], w_n[keep]))
summary = {
    "config": "2x2 t=1 U=4, G^>(t) for mode 0, dt=0.02 T=80 eta=0.08",
    "exact_peaks": [[round(float(w), 6), round(float(a), 6)] for w, a in peaks],
    "spectral_moment_sum": float(np.trapezoid(a_w, omegas)),
    "expected_moment": float(np.vdot(phi, phi).real),  # 1 - <n_0>
    "argmax_omega": float(omegas[np.argmax(a_w)]),
    "note": "peaks of A(omega) sit at the electron-addition energies; the "
            "integral recovers <gs|c c^dag|gs> up to the eta broadening tails.",
}
with open("greens.json", "w") as fh:
    json.dump(summary, fh, indent=1)
print(json.dumps(summary, indent=1))

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

fig, ax = plt.subplots(figsize=(6.0, 3.8))
ax.plot(omegas, a_w, color="#3a5ced", lw=1.6, label="A(w) from Trotter G(t)")
ymax = a_w.max()
first = True
for w, wt in peaks:
    if wt < 1e-3:  # invisible at this broadening; full table in greens.json
        continue
    ax.vlines(w, 0, ymax * 1.02, color="#8a8a8a", lw=1.2, ls=(0, (4, 3)),
              label="exact addition energies" if first else None)
    first = False
ax.set_xlim(omegas[0], omegas[-1])
ax.set_xlabel("omega (t)")
ax.set_ylabel("A(omega)")
ax.set_title("2x2 Hubbard electron-addition spectrum (mode 0)")
ax.legend(loc="upper right", fontsize=9, frameon=False)
ax.spines[["top", "right"]].set_visible(False)
fig.tight_layout()
fig.savefig("spectral.png", dpi=140)
print("wrote spectral.png")
