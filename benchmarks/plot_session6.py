#!/usr/bin/env python
"""Render figures for the thermal sweep and the 3x3 spectral function.

Reads the JSON artifacts written by thermal_2x2.py / spectral_3x3.py and
produces demo_thermal_2x2/thermal.png and demo_3x3/spectral.png.
Styling: measured series in palette blue/orange, exact references as
neutral dashed gray (identity also carried by linestyle, never color
alone), recessive grid, direct labels.
"""
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
BLUE, ORANGE, GRAY = "#2a78d6", "#eb6834", "#8a8a85"


def style(ax):
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    ax.grid(True, alpha=0.25, linewidth=0.6)
    ax.tick_params(labelsize=9)


# ---- thermal sweep ----------------------------------------------------------------
d = json.load(open(os.path.join(HERE, "demo_thermal_2x2", "thermal.json")))
rows = d["rows"]
T = np.array([r["T"] for r in rows])
fig, axes = plt.subplots(2, 1, figsize=(5.6, 6.2), sharex=True)
for ax, key, exact_key, label in (
    (axes[0], "E", "E_exact", "energy  $\\langle H\\rangle$"),
    (axes[1], "double_occ_per_site", "double_occ_exact",
     "double occupancy per site"),
):
    est = np.array([r[key] for r in rows])
    exact = np.array([r[exact_key] for r in rows])
    err = np.array([r.get("E_stderr", 0.0) for r in rows]) if key == "E" else None
    ax.plot(T, exact, "--", color=GRAY, lw=1.6, label="dense sector trace")
    ax.errorbar(T, est, yerr=err, fmt="o-", color=BLUE, lw=2, ms=5,
                capsize=3, label="typicality (32-128 samples)")
    ax.set_ylabel(label, fontsize=10)
    style(ax)
axes[0].legend(frameon=False, fontsize=9)
axes[1].set_xscale("log")
axes[1].set_xlabel("temperature  $T/t$", fontsize=10)
fig.suptitle("2x2 Hubbard U=6: canonical finite-T by imaginary-time typicality",
             fontsize=10.5)
fig.tight_layout()
fig.savefig(os.path.join(HERE, "demo_thermal_2x2", "thermal.png"), dpi=160)
plt.close(fig)

# ---- 3x3 spectral function ---------------------------------------------------------
d = json.load(open(os.path.join(HERE, "demo_3x3", "spectral.json")))
bands = d["bands"]
eta = 0.15
omegas = np.linspace(-9, 11, 800)
# fold equivalent momenta: group by sorted (|kx|, |ky|) class label
order = ["(0,0)", "(1,0)", "(0,1)", "(1,1)", "(2,1)", "(2,2)", "(2,0)", "(0,2)", "(1,2)"]
ks = [k for k in order if k in bands] + [k for k in bands if k not in order]
fig, ax = plt.subplots(figsize=(6.4, 7.0))
offset = 0.0
step = 1.15
yticks, ylabels = [], []
for k in ks:
    total = np.zeros_like(omegas)
    for branch, color in (("particle", BLUE), ("hole", ORANGE)):
        a = np.zeros_like(omegas)
        for pole, w in bands[k][branch]["main_poles"]:
            a += w * (eta / np.pi) / ((omegas - pole) ** 2 + eta**2)
        ax.fill_between(omegas, offset, offset + a, color=color, alpha=0.55, lw=0)
        total += a
    ax.plot(omegas, offset + total, color="#444444", lw=0.8)
    yticks.append(offset)
    ylabels.append(f"k={k}")
    offset += step
ax.axvline(0.0, color=GRAY, lw=0.8, ls="--")
ax.set_yticks(yticks, ylabels, fontsize=9)
ax.set_xlabel("$\\omega - E_0$  (units of $t$)", fontsize=10)
ax.set_title("3x3 Hubbard U=6, one hole (18 qubits): A(k,$\\omega$) by Lanczos resolvent\n"
             "electron removal (orange) / addition (blue); Hubbard-band splitting ~U",
             fontsize=10)
for side in ("top", "right", "left"):
    ax.spines[side].set_visible(False)
ax.tick_params(left=False)
fig.tight_layout()
fig.savefig(os.path.join(HERE, "demo_3x3", "spectral.png"), dpi=160)
print("wrote thermal.png and spectral.png")
