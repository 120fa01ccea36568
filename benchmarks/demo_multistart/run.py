#!/usr/bin/env python
"""Multistart exhibit: the 2x2 half-filling saddle vs a batch of inits.

The reference's HVA starts from zero angles (models/hva.py:204-208 analog),
which at 2x2 half filling is a symmetry saddle: loss pinned at exactly +2.0
with pure-roundoff gradients until Adam's noise floor tips it off (verify
skill, "known behaviors").  A multistart batch makes the escape structural
instead of lucky: 16 uniform(-0.1, 0.1) inits trained CONCURRENTLY in one
jitted scan (qsfh_tpu/algos/multistart.py), best start reported.

Writes multistart.json + multistart.png next to this file.
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import optax

from qsfh_tpu.algos.multistart import MultistartHVA, batched_train

B, EPOCHS, REPS, LR = 16, 400, 4, 3e-2

ms = MultistartHVA(
    n_starts=B, n_epoch=EPOCHS, reps=REPS, lr=LR,
    x_dimension=2, y_dimension=2, n_electrons=4, n_spin_up=2, n_spin_down=2,
    tunneling=1.0, coulomb=6.0, init_scale=0.1, seed=0,
    results_root=HERE,
)
out = ms.run()
e0 = ms.ground_state_energy

# the reference's init: zero angles (the saddle), same optimizer/epochs
import jax.numpy as jnp

zero = {k: jnp.zeros_like(v[:1]) for k, v in ms.batch_params.items()}
_, zero_traj, zero_final = batched_train(
    ms.loss, zero, optax.adam(LR), EPOCHS
)
zero_traj = np.asarray(zero_traj)[:, 0]
zero_final = float(np.asarray(zero_final)[0])

traj = out["energies"]  # (EPOCHS, B)
best = out["best_index"]
result = {
    "config": {"B": B, "epochs": EPOCHS, "reps": REPS, "lr": LR,
               "lattice": "2x2 half filling U=6", "init_scale": 0.1, "seed": 0},
    "ed_energy": e0,
    "best_energy": out["best_energy"],
    "best_gap": out["best_gap"],
    "final_energies": out["final_energies"].tolist(),
    "zero_init_final": zero_final,
    "zero_init_gap": zero_final - e0,
    "saddle_epochs_zero_init": int(np.sum(np.abs(zero_traj - 2.0) < 1e-6)),
}
with open(os.path.join(HERE, "multistart.json"), "w") as f:
    json.dump(result, f, indent=1)

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

fig, ax = plt.subplots(figsize=(7.2, 4.4))
epochs = np.arange(EPOCHS)
for b in range(B):
    if b != best:
        ax.plot(epochs, traj[:, b], color="0.78", lw=0.9, zorder=1)
ax.plot(epochs, traj[:, best], color="#2a6fb0", lw=2.0, zorder=3,
        label=f"best of {B} starts (one jitted scan)")
ax.plot(epochs, zero_traj, color="#d07f28", lw=2.0, zorder=2,
        label="zero init (the reference's start)")
ax.axhline(e0, color="0.25", lw=1.2, ls="--", zorder=0, label="exact (ED)")
ax.plot([], [], color="0.78", lw=0.9, label="other starts")
ax.set_xlabel("epoch")
ax.set_ylabel("energy  $\\langle H \\rangle$  [t]")
ax.set_title("2x2 Hubbard HVA: 16-start batch vs the zero-init saddle")
ax.grid(color="0.92", lw=0.7)
ax.set_axisbelow(True)
for s in ("top", "right"):
    ax.spines[s].set_visible(False)
ax.legend(frameon=False, loc="upper right", fontsize=9)
ax.annotate(f"best gap {out['best_gap']:.2e} Ha-equiv",
            xy=(EPOCHS - 1, out["best_energy"]),
            xytext=(-8, 10), textcoords="offset points",
            ha="right", fontsize=8, color="#2a6fb0")
fig.tight_layout()
fig.savefig(os.path.join(HERE, "multistart.png"), dpi=150)
print(json.dumps(result, indent=1))
