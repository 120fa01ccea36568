#!/usr/bin/env python
"""Momentum-resolved spectral function A(k, omega) of the 2x2 Hubbard model.

For each lattice momentum k, the particle branch comes from
G^>(t) with the momentum-space ladder c^dag_{k,up} (a FermionOperator
superposition passed straight to greens_function) and the hole branch
from c_{k,up}; their transforms stack into A(k, omega) whose peaks are
the exact electron addition/removal energies -- the Hubbard-band picture
the model is famous for.  Exact stick spectra from dense diagonalization
overlay every panel.
"""
import os, sys, json
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
os.chdir(HERE)

import numpy as np

from qsfh_tpu.algos.base import HubbardProblem
from qsfh_tpu.algos.dynamics import greens_function
from qsfh_tpu.ops.fermion import FermionOperator
from qsfh_tpu.ops.jw import jordan_wigner
from qsfh_tpu.utils.dense import paulisum_to_dense

NX = NY = 2
p = HubbardProblem(NX, NY, 1.0, 4.0, 4, 2, 2, results_root=HERE)
e0, gs = p.ground_state()
gs = np.asarray(gs)
h = paulisum_to_dense(p.qubit_hamiltonian, p.n_qubits)
evals, evecs = np.linalg.eigh(h)

dt, T, eta = 0.02, 60.0, 0.1
n_steps = int(round(T / dt))
omegas = np.linspace(-8.0, 8.0, 1600)


def k_ladder(kx, ky, dagger):
    """c^dag_{k,up} (or c_{k,up}): (1/sqrt(N)) sum_r e^{+-i k.r} ladder_r."""
    op = FermionOperator.zero()
    for s in range(NX * NY):
        x, y = s % NX, s // NX
        phase = np.exp(1j * 2 * np.pi * (kx * x / NX + ky * y / NY))
        op += FermionOperator(((2 * s, 1 if dagger else 0),),
                              (phase if dagger else phase.conjugate()) / np.sqrt(NX * NY))
    return op


def branch(op, sign):
    """Transform one Green's branch: sign=+1 addition, -1 removal."""
    times, g = greens_function(p, gs, e0, mode=op, dt=dt, n_steps=n_steps)
    phase = np.exp(1j * sign * np.outer(omegas, times) - eta * times)
    return (phase @ g).real * dt / np.pi


def exact_sticks(op_dense, sign):
    phi = op_dense @ gs
    w = np.abs(evecs.conj().T @ phi) ** 2
    e = sign * (evals - e0)
    keep = w > 1e-3
    return sorted(zip(e[keep], w[keep]))


ks = [(0, 0), (1, 0), (0, 1), (1, 1)]
panels = []
for kx, ky in ks:
    cdag = k_ladder(kx, ky, dagger=True)
    c = k_ladder(kx, ky, dagger=False)
    a_w = branch(cdag, +1) + branch(c, -1)
    sticks = exact_sticks(paulisum_to_dense(jordan_wigner(cdag), p.n_qubits), +1) \
        + exact_sticks(paulisum_to_dense(jordan_wigner(c), p.n_qubits), -1)
    panels.append(((kx, ky), a_w, sticks))
    print(f"k=({kx},{ky}): sticks at", [round(w, 3) for w, _ in sticks])

summary = {
    "config": f"2x2 t=1 U=4, A(k,omega), dt={dt} T={T} eta={eta}",
    "sticks": {f"({kx},{ky})": [[round(float(w), 6), round(float(a), 6)]
                                for w, a in sticks]
               for (kx, ky), _, sticks in panels},
    "note": "particle branch at E(N+1)-E0, hole branch at E0-E(N-1); "
            "spectral weight integrates to 1 per k (addition + removal).",
}
with open("band.json", "w") as fh:
    json.dump(summary, fh, indent=1)

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

fig, axes = plt.subplots(len(ks), 1, figsize=(6.4, 7.2), sharex=True)
for ax, ((kx, ky), a_w, sticks) in zip(axes, panels):
    ax.plot(omegas, a_w, color="#3a5ced", lw=1.4,
            label="A(k,w) from Trotter G(t)" if (kx, ky) == (0, 0) else None)
    for i, (w, wt) in enumerate(sticks):
        ax.vlines(w, 0, a_w.max() * 1.02, color="#8a8a8a", lw=1.1, ls=(0, (4, 3)),
                  label="exact energies" if ((kx, ky) == (0, 0) and i == 0) else None)
    ax.set_ylabel(f"k=({'0' if kx==0 else 'pi'},{'0' if ky==0 else 'pi'})",
                  fontsize=9)
    ax.set_xlim(omegas[0], omegas[-1])
    ax.spines[["top", "right"]].set_visible(False)
axes[0].legend(loc="upper left", fontsize=8, frameon=False)
axes[0].set_title("2x2 Hubbard A(k, omega): Hubbard bands vs exact")
axes[-1].set_xlabel("omega (t)")
fig.tight_layout()
fig.savefig("band.png", dpi=140)
print("wrote band.png")
