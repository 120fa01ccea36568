#!/usr/bin/env python
"""Render the 3x3 dynamical spin structure factor figure.

Reads demo_3x3/sqw.json (benchmarks/sqw_3x3.py) and produces
demo_3x3/sqw.png: a single-hue sequential heatmap of S^zz(q, omega) over
the nine lattice momenta (magnitude job -> one hue light-to-dark, never a
rainbow), with the integrated weight per q direct-labeled along the top.
Styling follows plot_session6.py: recessive grid/axes, text in neutral
ink, no dual axes.
"""
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
TAG = os.environ.get("QSFH_SQW_TAG", "sqw")  # 'sqw' (spin) or 'nqw' (charge)
d = json.load(open(os.path.join(HERE, "demo_3x3", f"{TAG}.json")))
g = np.load(os.path.join(HERE, "demo_3x3", f"{TAG}_grid.npz"))
omegas = np.asarray(g["omegas"])
qs = [str(q) for q in g["qs"]]
grid = np.asarray(g["A"])  # (9, n_omega)

fig, ax = plt.subplots(figsize=(6.4, 4.2))
im = ax.imshow(
    grid,
    aspect="auto",
    origin="lower",
    extent=[omegas[0], omegas[-1], -0.5, len(qs) - 0.5],
    cmap="Blues",
    interpolation="bilinear",
)
ax.set_yticks(range(len(qs)))
ax.set_yticklabels([f"({q.replace(',', ',')})" for q in qs], fontsize=9)
ax.set_xlabel(r"$\omega$  (units of $t$)", fontsize=10)
ax.set_ylabel(r"$q = 2\pi(q_x/3,\ q_y/3)$", fontsize=10)
label = r"$S^{zz}(q,\omega)$" if TAG == "sqw" else r"$N(q,\omega)$"
kindname = "spin" if TAG == "sqw" else "charge"
ax.set_title(
    f"3x3 Hubbard {label} via Lanczos resolvent"
    f"\n(18 qubits, {kindname} sector, per-q sum rules "
    f"exact to {d['max_sum_rule_err']:.1e})",
    fontsize=10,
)
for i, q in enumerate(qs):
    w = d["q_rows"][q]["weights_sum"]
    ax.text(
        omegas[-1] - 0.15, i, f"{w:.3f}", va="center", ha="right",
        fontsize=8, color="#444444",
    )
cb = fig.colorbar(im, ax=ax, pad=0.02)
cb.set_label(label, fontsize=9)
cb.ax.tick_params(labelsize=8)
ax.tick_params(labelsize=9)
fig.tight_layout()
out = os.path.join(HERE, "demo_3x3", f"{TAG}.png")
fig.savefig(out, dpi=150)
print("wrote", out)
