#!/usr/bin/env python
"""iQCC-Hubbard convergence demo: the reference's own experiment config.

/root/reference/models/iqcc_hubbard.py:215-231 -- 2x2 lattice, t=1, U=4,
periodic, n_epoch=100, lr=1e-2, threshold=5e-3, dense-ED ground truth
(iqcc_hubbard.py:57).  Runs to the reference's convergence criterion
(empty DIS selection / grad-norm threshold) with dressed-term growth
logged each epoch.

A second short run with a low ``max_terms`` cap exercises the dressing
term cap (ops/dressing.py) and logs the drops.

Artifacts land under this directory (results/, images/, summary.json).
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

os.chdir(HERE)

from qsfh_tpu.algos.iqcc import IQCC  # noqa: E402
from qsfh_tpu.ops.lattice import fermi_hubbard  # noqa: E402


def compacted_leg(hamiltonian):
    """Error-budgeted compaction at a USABLE operating point.

    The round-2 hard cap (max_terms=120) destroyed 1.2 Ha of physics;
    this leg instead runs the full reference config with a per-epoch
    coefficient-magnitude budget (ops/dressing.py compact): drop the
    smallest-|c| tail only while its summed weight stays within
    eps=2e-4 Ha, so 21 epochs carry a RIGOROUS cumulative
    eigenvalue-shift bound <= 21*2e-4 = 4.2 mHa (Weyl), and the
    achieved error should sit within ~5 mHa of the uncapped 0.14 mHa.
    """
    eps = float(os.environ.get("QSFH_IQCC_EPS", "2e-4"))
    max_terms = int(os.environ.get("QSFH_IQCC_MAXTERMS", "0")) or None
    mt = f"-mt{max_terms}" if max_terms else ""
    vqe = IQCC(
        hamiltonian=hamiltonian,
        n_epoch=100,
        lr=1e-2,
        threshold=5e-3,
        compaction_eps=eps,
        max_terms=max_terms,
        ground_truth=True,
        results_root=os.path.join(HERE, f"results_compacted_{eps:g}{mt}"),
        tag=f"IQCC-hubbard-2x2-compacted-{eps:g}{mt}",
        plot=False,
        log_metrics=False,
    )
    t0 = time.time()
    hist = vqe.run()
    return {
        "compaction_eps_per_epoch": eps,
        "max_terms": max_terms,
        "epochs": len(hist["epoch"]),
        "final_energy": hist["epoch"][-1],
        "error_mHa": 1e3 * (hist["epoch"][-1] - vqe.ground_state_energy),
        "eigenvalue_shift_bound_mHa": 1e3 * vqe.compaction_bound,
        "dressed_terms_final": len(vqe.current_hamiltonian),
        "wall_clock_s": round(time.time() - t0, 1),
    }


def main():
    hamiltonian = fermi_hubbard(
        x_dimension=2, y_dimension=2, tunneling=1.0, coulomb=4.0,
        periodic=True, spinless=False,
    )
    if "--compacted-only" in sys.argv:
        path = os.path.join(HERE, "summary.json")
        summary = json.load(open(path))
        leg = compacted_leg(hamiltonian)
        runs = summary.setdefault("compacted_runs", [])
        key = lambda r: (r["compaction_eps_per_epoch"], r.get("max_terms") or 0)
        runs[:] = [r for r in runs if key(r) != key(leg)]
        runs.append(leg)
        runs.sort(key=key)
        summary.pop("compacted_run", None)
        with open(path, "w") as f:
            json.dump(summary, f, indent=1)
        print(json.dumps(leg, indent=1))
        return
    t0 = time.time()
    vqe = IQCC(
        hamiltonian=hamiltonian,
        n_epoch=100,
        lr=1e-2,
        threshold=5e-3,
        ground_truth=True,
        results_root=os.path.join(HERE, "results"),
        tag="IQCC-hubbard-2x2",
        plot=True,
        log_metrics=True,
    )
    history = vqe.run()
    elapsed = time.time() - t0

    e_final = history["epoch"][-1]
    e_exact = vqe.ground_state_energy
    terms = len(vqe.current_hamiltonian)
    summary = {
        "config": "2x2 t=1 U=4 periodic (reference iqcc_hubbard.py:215-231)",
        "epochs": len(history["epoch"]),
        "iterations": len(history["iteration"]),
        "final_energy": e_final,
        "exact_energy": e_exact,
        "error_mHa": 1e3 * (e_final - e_exact),
        "dressed_terms_final": terms,
        "selected_ops": vqe.selected_ops,
        "wall_clock_s": round(elapsed, 1),
    }
    print(json.dumps(summary, indent=1))

    # --- capped run: exercise the max_terms drop path ---
    capped = IQCC(
        hamiltonian=hamiltonian,
        n_epoch=4,
        lr=1e-2,
        threshold=5e-3,
        max_terms=120,
        ground_truth=True,
        results_root=os.path.join(HERE, "results_capped"),
        tag="IQCC-hubbard-2x2-capped",
        plot=False,
        log_metrics=False,
    )
    capped_hist = capped.run()
    summary["capped_run"] = {
        "max_terms": 120,
        "epochs": len(capped_hist["epoch"]),
        "final_energy": capped_hist["epoch"][-1],
        "error_mHa": 1e3 * (capped_hist["epoch"][-1] - capped.ground_state_energy),
        "dressed_terms_final": len(capped.current_hamiltonian),
    }
    summary["compacted_run"] = compacted_leg(hamiltonian)
    with open(os.path.join(HERE, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary["capped_run"], indent=1))


if __name__ == "__main__":
    main()
