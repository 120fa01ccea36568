#!/usr/bin/env python
"""Lattice VQD demo: excited states of the 2x2 Hubbard symmetric sector.

Deflation over the momentum-conserving HVA ansatz (VQD ansatz injection)
finds the ground state and the first k=(0,0) excited state of the
(N=4, Sz=0) sector to ED precision, and -- the physics point -- SKIPS the
k=(1,1) level in between, which the ansatz cannot represent (verified
with the momentum projectors of linalg/symmetry.py).  The reference
framework has no excited-state capability at all.
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

from qsfh_tpu.algos.hva import HVA
from qsfh_tpu.algos.vqd import VQD
from qsfh_tpu.linalg.exact import get_sparse_operator, jw_number_spin_restrict_operator
from qsfh_tpu.linalg.symmetry import momentum_weights

hva = HVA(n_epoch=0, reps=6, lr=3e-2, x_dimension=2, y_dimension=2,
          n_electrons=4, n_spin_up=2, n_spin_down=2, tunneling=1, coulomb=6,
          results_root=HERE, plot=False, log_metrics=False)

# exact sector spectrum for the golden rules
sp = get_sparse_operator(hva.problem.fermion_hamiltonian, 8)
restricted = jw_number_spin_restrict_operator(sp, 4, 2, 2, 8).toarray()
sector_evals = np.linalg.eigvalsh(restricted)


def init(key):
    ks = jax.random.split(key, len(hva.params))
    return {k: 0.05 * jax.random.normal(kk, np.asarray(v).shape,
                                        dtype=np.asarray(v).dtype)
            for kk, (k, v) in zip(ks, hva.params.items())}


vqd = VQD(hva.problem.fermion_hamiltonian, n_qubits=8, n_levels=2,
          n_epoch=2500, lr=3e-2, beta=6.0, seed=0, threshold=1e-4,
          results_root=HERE, tag="VQD-HVA-2x2",
          circuit=hva.circuit, init_params=init)
E = vqd.run()

momenta = [
    {f"({kx},{ky})": round(w, 6)
     for (kx, ky), w in momentum_weights(s, 2, 2).items() if w > 1e-6}
    for s in vqd.states
]
summary = {
    "config": "2x2 t=1 U=6, sector N=4 Sz=0, HVA ansatz reps=6 + VQD deflation",
    "sector_evals_lowest_4": [float(x) for x in sector_evals[:4]],
    "vqd_levels": E,
    "vqd_errors_Ha": [float(E[0] - sector_evals[0]), float(E[1] - sector_evals[2])],
    "level_momenta": momenta,
    "note": "level 1 converges to the THIRD sector eigenvalue: the k=(1,1) "
            "state at -1.291503 in between is unreachable by the "
            "momentum-conserving ansatz (level momenta are pure k=(0,0)), "
            "so deflation lands on the first symmetric excited state.",
}
with open("summary.json", "w") as fh:
    json.dump(summary, fh, indent=1)
print(json.dumps(summary, indent=1))

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

fig, ax = plt.subplots(figsize=(5.2, 4.2))
for i, e in enumerate(sector_evals[:4]):
    reachable = i != 1
    ax.hlines(e, 0.08, 0.92, color="#8a8a8a", lw=1.5,
              ls="-" if reachable else (0, (4, 3)),
              label="exact sector level" if i == 0 else
                    ("exact, k=(1,1) (ansatz-inaccessible)" if i == 1 else None))
ax.plot([0.4, 0.4], E, "o", ms=9, color="#3a5ced", zorder=3, label="VQD (HVA ansatz)")
for e, txt in [(sector_evals[0], "ground, k=(0,0)"),
               (sector_evals[1], "k=(1,1) — skipped"),
               (sector_evals[2], "1st excited, k=(0,0)")]:
    ax.annotate(txt, xy=(0.94, e), fontsize=9, color="#444444", va="center")
ax.set_xlim(0, 1.6)
ax.set_xticks([])
ax.set_ylabel("energy (t)")
ax.set_title("2x2 Hubbard (N=4, Sz=0): VQD over the HVA ansatz")
ax.legend(loc="center left", fontsize=8, frameon=False, bbox_to_anchor=(0.02, 0.42))
ax.spines[["top", "right", "bottom"]].set_visible(False)
fig.tight_layout()
fig.savefig("levels.png", dpi=140)
print("wrote levels.png")
