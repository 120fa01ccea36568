#!/usr/bin/env python
"""Dynamical spin structure factor S^zz(q, omega) of the 18-qubit 3x3
Hubbard model via the Lanczos resolvent — two-particle spectroscopy at
flagship scale (the single-particle A(k, omega) companion is
benchmarks/spectral_3x3.py).

Validation without dense spectra: for every q the integrated weight
sum_k w_k must equal the static correlator <gs|S^z_{-q} S^z_q|gs>,
evaluated independently as one matrix-free expectation of the symbolic
operator product — exact at any total spin (the 9-electron 5up/4down
ground state is NOT an SU(2) singlet, so the S(q) = 3 S_zz(q) shortcut
tested at 2x2 does not apply here).  The AFM point q = (pi, pi) must
carry the dominant weight for the half-filled-like U=6 system.

Writes benchmarks/demo_3x3/sqw.json.
"""
import os, sys, json, time
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

DEMO = os.path.join(HERE, "demo_3x3")
os.chdir(DEMO)

from qsfh_tpu.algos.base import HubbardProblem
from qsfh_tpu.engine.expectation import Observable
from qsfh_tpu.linalg.spectral import dynamical_structure_factor
from qsfh_tpu.ops.correlations import charge_q_operator, spin_q_operator
from qsfh_tpu.ops.fermion import hermitian_conjugated
from qsfh_tpu.ops.jw import jordan_wigner

NX = NY = 3
M = int(os.environ.get("QSFH_SQW_M", "80"))
KIND = os.environ.get("QSFH_SQW_KIND", "spin")  # 'spin' -> sqw.json, 'charge' -> nqw.json
TAG = "sqw" if KIND == "spin" else "nqw"
p = HubbardProblem(NX, NY, 1.0, 6.0, 9, 5, 4, results_root=DEMO)
e0, manifold = p.ground_state(degenerate=True, n_states=4)
gs = np.asarray(manifold[0])
e0 = float(e0)

t0 = time.time()
omegas = np.linspace(0.0, 10.0, 201) if KIND == "spin" else np.linspace(0.0, 16.0, 321)
rows = {}
import jax.numpy as jnp
psi = jnp.asarray(gs)
for qx in range(NX):
    for qy in range(NY):
        res = dynamical_structure_factor(
            p, gs, e0, q=(qx, qy), kind=KIND, m=M,
            omegas=omegas, eta=0.1, dtype=jnp.complex128,
        )
        # independent sum rule: <gs| O_{-q} O_q |gs> as one symbolic
        # operator product evaluated matrix-free
        if KIND == "spin":
            sq = spin_q_operator(NX, NY, qx, qy)
        else:
            sq = charge_q_operator(NX, NY, qx, qy, filling=p.n_electrons / 9)
        stat = float(
            Observable(jordan_wigner(hermitian_conjugated(sq) * sq), 18).expectation(psi)
        )
        w_sum = float(res["weights"].sum())
        rows[f"{qx},{qy}"] = {
            "weights_sum": w_sum,
            "static_SzzQ": stat,
            "sum_rule_abs_err": abs(w_sum - stat),
            "first_pole": float(res["poles"][res["weights"] > 1e-8][0])
            if (res["weights"] > 1e-8).any() else None,
            "A": res["A"].tolist(),
        }
        print(f"q=({qx},{qy}): sum w = {w_sum:.8f}  static = {stat:.8f}  "
              f"err = {abs(w_sum-stat):.2e}", flush=True)

afm = rows["1,1"], rows["2,2"]
weights = {k: v["weights_sum"] for k, v in rows.items()}
peak_q = max(weights, key=weights.get)
out = {
    "n_qubits": 18,
    "m_krylov": M,
    "elapsed_s": round(time.time() - t0, 1),
    "omegas": omegas.tolist(),
    "q_rows": {k: {kk: vv for kk, vv in v.items() if kk != "A"} for k, v in rows.items()},
    "peak_q": peak_q,
    "kind": KIND,
    "max_sum_rule_err": max(v["sum_rule_abs_err"] for v in rows.values()),
}
with open(os.path.join(DEMO, f"{TAG}.json"), "w") as f:
    json.dump(out, f, indent=1)
np.savez_compressed(
    os.path.join(DEMO, f"{TAG}_grid.npz"),
    omegas=omegas,
    qs=np.array(sorted(rows, key=lambda s: tuple(map(int, s.split(","))))),
    A=np.vstack([
        rows[q]["A"] for q in sorted(rows, key=lambda s: tuple(map(int, s.split(","))))
    ]),
)
print(json.dumps({k: v for k, v in out.items() if k not in ("omegas",)}, indent=1))
assert out["max_sum_rule_err"] < 1e-6, out["max_sum_rule_err"]
