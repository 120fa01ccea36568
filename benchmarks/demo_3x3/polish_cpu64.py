#!/usr/bin/env python
"""CPU float64 L-BFGS polish of the flagship 3x3 ADAPT ansatz.

The on-chip df polish (polish_lbfgs.py) converged to its measured floor
at 0.0354 mHa: the STATE is float32 on the chip, so below ~1e-7 Ha the
line search cannot resolve coherent descent even with the double-float
reduction, and scipy stops on relative-reduction (38 evals, f64-anchored
gnorm still 8.3e-4).  This driver continues in FULL float64 on the CPU
(the reference's own precision -- torch complex128,
/root/reference/models/hva.py:145): same split raw stages as
anchor_f64.py, scipy L-BFGS-B, ~1-2 min per (energy, gradient) eval at
1719 ops.  Progress logs to polish_cpu64.jsonl, best parameters to
polish_cpu64_best.npz (crash-safe), checkpoint + anchors.jsonl updated
on improvement.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, "..", "..")
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
from scipy.optimize import minimize  # noqa: E402

from qsfh_tpu.algos.adapt import ADAPT  # noqa: E402
from qsfh_tpu.algos.adapt_fused import initial_state_reim  # noqa: E402
from qsfh_tpu.ops.pool import hubbard_interaction_pool_extended  # noqa: E402

MAXITER = int(os.environ.get("QSFH_POLISH64_MAXITER", "200"))
GTOL = float(os.environ.get("QSFH_POLISH64_GTOL", "1e-6"))
DEADLINE_S = float(os.environ.get("QSFH_POLISH64_DEADLINE", "1e9"))
LOG = os.path.join(HERE, "polish_cpu64.jsonl")
BEST = os.path.join(HERE, "polish_cpu64_best.npz")


def main():
    vqe = ADAPT(
        n_epoch=0, threshold1=1e-3, threshold2=1e-3,
        x_dimension=3, y_dimension=3, n_electrons=9, n_spin_up=5,
        n_spin_down=4, tunneling=1, coulomb=6, degenerate_subspace=4,
        pool=hubbard_interaction_pool_extended(3, 3),
        load_model=True, results_root=HERE, plot=False, log_metrics=False,
    )
    ed = float(vqe.ground_state_energy)
    indices = tuple(vqe.selected_indices)
    print(f"ansatz: {len(indices)} ops | ED {ed:+.9f} | f64 CPU", flush=True)

    step = vqe._build_step(indices, optax.adam(1e-3))
    raw = step.raw_stages
    fwd = jax.jit(raw["fwd_from"])
    energy = jax.jit(raw["energy"])
    cot = jax.jit(raw["cotangent"])
    adj = jax.jit(raw["adjoint"])
    metrics = jax.jit(raw["metrics"])
    psi0 = initial_state_reim(vqe)
    state = {"n": 0, "best_e": np.inf, "best_x": None, "t0": time.time()}

    class Deadline(Exception):
        pass

    def f(x64):
        th = jnp.asarray(x64)
        psi = fwd(psi0, th)
        e = float(energy(psi))
        lam = cot(psi)
        g = np.asarray(adj(psi, lam, th), np.float64)
        state["n"] += 1
        if e < state["best_e"]:
            state["best_e"], state["best_x"] = e, np.asarray(x64, np.float64)
            np.savez(BEST + ".tmp.npz", t=state["best_x"], energy=e)
            os.replace(BEST + ".tmp.npz", BEST)
        rec = {
            "eval": state["n"], "E": e, "gap_mHa": 1e3 * (e - ed),
            "gnorm": float(np.linalg.norm(g)),
            "elapsed_s": round(time.time() - state["t0"], 1),
        }
        with open(LOG, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        if state["n"] % 5 == 1:
            print(f"[polish64] eval {state['n']:4d} | E {e:+.9f} | "
                  f"gap {rec['gap_mHa']:+.5f} mHa | gnorm {rec['gnorm']:.3e} | "
                  f"{rec['elapsed_s']:.0f}s", flush=True)
        if time.time() - state["t0"] > DEADLINE_S:
            raise Deadline
        return e, g

    x0 = np.asarray(vqe.params_t, np.float64)
    try:
        res = minimize(
            f, x0, jac=True, method="L-BFGS-B",
            options=dict(maxiter=MAXITER, maxcor=50, ftol=1e-18, gtol=GTOL,
                         maxls=40),
        )
        msg = f"status={res.status} {res.message}"
    except Deadline:
        msg = "stopped at deadline"
    xb, eb = state["best_x"], state["best_e"]
    print(f"L-BFGS(f64) done: {msg} | {state['n']} evals | "
          f"best E {eb:+.9f} (gap {1e3*(eb-ed):+.5f} mHa)", flush=True)

    e_start = None
    with open(LOG) as fh:
        for line in fh:
            e_start = json.loads(line)["E"]
            break
    if xb is not None and eb < (e_start if e_start is not None else np.inf):
        th = jnp.asarray(xb)
        vqe.params_t = th
        psi = fwd(psi0, th)
        sz, s2, fid = (float(np.asarray(v)) for v in metrics(psi))
        vqe.results["iteration loss"].append(eb)
        vqe.results["Sz"].append(sz)
        vqe.results["S^2"].append(s2)
        vqe.results["fidelity"].append(fid)
        vqe.results["epoch loss"].append(eb)
        vqe.save_model()
        print(f"checkpoint updated: E {eb:+.9f} | fid {fid:.7f} | "
              f"Sz {sz:+.6f} | S^2 {s2:+.6f}", flush=True)
        subprocess.run([sys.executable, os.path.join(HERE, "anchor_f64.py")])
    else:
        print("no improvement; checkpoint untouched", flush=True)


if __name__ == "__main__":
    main()
