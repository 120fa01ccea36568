#!/usr/bin/env python
"""Plateau-control experiment: does a 7x larger per-epoch selection
change the geometric decay rate of exact-dressing iQCC on 2x3?

Resumes the epoch-15 plateau checkpoint (err 0.2484 Ha, gains decaying
at ratio ~0.58/epoch under threshold=5e-3 -> 111 generators/epoch) with
threshold=1e-3, which the plateau diagnostic says selects ~768
generators/epoch.  If the decay ratio is unchanged, the plateau is a
property of first-order QCC steps from a QMF reference (iQCC-ILC
territory), not of the selection cut.  3 epochs is enough to read the
per-epoch gains off against the 5e-3 trajectory (0.45/0.26/0.15 mHa
projected for epochs 16-18).
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
    n_epoch=18, lr=1e-2, threshold=1e-3,
    max_inner_iterations=2000,
    inner_optimizer="lbfgs",
    dense_dressing=True,
    ground_truth=True,
    results_root=os.path.join(HERE, "results_thr1e3"),
    tag="IQCC-2x3-dense", plot=False, log_metrics=True,
    load_model=True,
)
t0 = time.time()
OUT = os.path.join(HERE, "dense_thr1e3.json")
marks = list(json.load(open(OUT))["marks"]) if os.path.exists(OUT) else []
orig_save = vqe.save_model
def save_and_mark():
    orig_save()
    marks.append({
        "epoch": len(vqe.loss_history["epoch"]),
        "terms": vqe._dense_nnz,
        "energy": vqe.loss_history["epoch"][-1],
        "error_Ha": vqe.loss_history["epoch"][-1] - vqe.ground_state_energy,
        "n_taus": int(vqe.params["tau"].shape[0]),
        "elapsed_s": round(time.time() - t0, 1),
    })
    with open(OUT, "w") as f:
        json.dump({"exact": vqe.ground_state_energy, "backend": "dense",
                   "threshold": 1e-3, "resumed_from_epoch": 15,
                   "marks": marks}, f, indent=1)
vqe.save_model = save_and_mark
vqe.run()
print("DONE", json.dumps(marks[-1] if marks else {}))
