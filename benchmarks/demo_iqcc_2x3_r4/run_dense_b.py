#!/usr/bin/env python
"""iQCC 2x3 dense-exact continuation (resume of run_dense.py's epoch-2
checkpoint) with the r4 session-2 speedups:

* scan-lowered inner circuit (>=12 selected rotations -> one scan segment
  instead of a ~250-gate unrolled jaxpr whose XLA compile dominated the
  45-minute epochs of probe_growth.log),
* adam-warmup -> L-BFGS inner optimizer (~10x fewer inner iterations),
* DIS selection straight from the dense matrix (no 4^n PauliSum view),
* dense-H checkpoint sidecar (.dense.npy) for exact resume.

VERDICT r3 next #3: "Make iQCC survive 2x3" -- this is the convergence
campaign; dense dressing has zero truncation error so the only remaining
error is variational.
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
    n_epoch=40, lr=1e-2, threshold=5e-3,
    max_inner_iterations=2000,
    inner_optimizer="lbfgs",
    dense_dressing=True,
    ground_truth=True,
    results_root=os.path.join(HERE, "results_dense"),
    tag="IQCC-2x3-dense", plot=False, log_metrics=True,
    load_model=True,
)
t0 = time.time()
marks = list(json.load(open(os.path.join(HERE, "dense.json")))["marks"]) \
    if os.path.exists(os.path.join(HERE, "dense.json")) else []
orig_save = vqe.save_model
def save_and_mark():
    orig_save()
    marks.append({
        "epoch": len(vqe.loss_history["epoch"]),
        "terms": vqe._dense_nnz,
        "energy": vqe.loss_history["epoch"][-1],
        "error_Ha": vqe.loss_history["epoch"][-1] - vqe.ground_state_energy,
        "elapsed_s": round(time.time() - t0, 1),
    })
    with open(os.path.join(HERE, "dense.json"), "w") as f:
        json.dump({"exact": vqe.ground_state_energy, "backend": "dense",
                   "optimizer": "adam-warmup+lbfgs",
                   "marks": marks}, f, indent=1)
vqe.save_model = save_and_mark
vqe.run()
print("DONE", json.dumps(marks[-1] if marks else {}))
