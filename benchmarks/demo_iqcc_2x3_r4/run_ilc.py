#!/usr/bin/env python
"""iQCC-ILC campaign on the 2x3 plateau.

Resumes the epoch-15 plateau checkpoint of the dense-exact campaign
(error 0.2484 Ha, per-epoch gains decaying geometrically to a fixed
point ~0.2477 Ha -- dense.json plateau_diagnostic) with ILC boost folds
(ops/ilc.py) after every standard epoch: subspace diagonalization over a
mutually anticommuting DIS subset, folded exactly by the dense backend.
Second-order couplings keep ILC productive where every first-order DIS
gradient has collapsed, so this either breaks the measured plateau or
bounds what ILC buys -- both answers the round-3 verdict asked for.
"""
import json, os, sys, time
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
os.chdir(HERE)
from qsfh_tpu.algos.iqcc import IQCC
from qsfh_tpu.ops.lattice import fermi_hubbard

vqe = IQCC(
    hamiltonian=fermi_hubbard(2, 3, 1.0, 4.0, periodic=True, spinless=False),
    n_epoch=60, lr=1e-2, threshold=5e-3,
    max_inner_iterations=2000,
    inner_optimizer="lbfgs",
    dense_dressing=True,
    ilc=True, ilc_cap=48, ilc_rounds=3,
    ground_truth=True,
    results_root=os.path.join(HERE, "results_ilc"),
    tag="IQCC-2x3-dense", plot=False, log_metrics=True,
    load_model=True,
)
t0 = time.time()
OUT = os.path.join(HERE, "dense_ilc.json")
marks = list(json.load(open(OUT))["marks"]) if os.path.exists(OUT) else []
orig_save = vqe.save_model
def save_and_mark():
    orig_save()
    marks.append({
        "epoch": len(vqe.loss_history["epoch"]),
        "terms": vqe._dense_nnz,
        "energy": vqe.loss_history["epoch"][-1],
        "error_Ha": vqe.loss_history["epoch"][-1] - vqe.ground_state_energy,
        "n_ilc_folds": sum(1 for s in vqe.selected_ops if s.startswith("ILC[")),
        "elapsed_s": round(time.time() - t0, 1),
    })
    with open(OUT, "w") as f:
        json.dump({"exact": vqe.ground_state_energy, "backend": "dense",
                   "ilc": {"cap": 48, "rounds": 3},
                   "resumed_from_epoch": 15, "marks": marks}, f, indent=1)
vqe.save_model = save_and_mark
vqe.run()
print("DONE", json.dumps(marks[-1] if marks else {}))
