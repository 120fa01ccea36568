#!/usr/bin/env python
"""2x3 dense iQCC control: Adam inner loop + ILC, from scratch.

The 2x2 campaign measured that the L-BFGS inner loop can lock iQCC into
a landscape trap that Adam's under-convergence escapes
(demo_iqcc_2x2/dense_ilc.json caveat).  The 2x3 plateau analysis
(ANALYSIS.md) is STATE-based (the 1024-dim subspace ceiling at the
epoch-15 state bounds any continuation from that state), but the
trajectory that reached that state used adam-warmup+L-BFGS.  This
control runs the full reference-style Adam inner loop from scratch with
ILC folds: if it lands at the same ~0.25 Ha wall, the plateau is
optimizer-independent; if materially better, the analysis needs a
revision.  Writes dense_adam_ilc.json.
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
    n_epoch=int(os.environ.get("QSFH_ADAM_EPOCHS", "16")),
    lr=1e-2, threshold=5e-3,
    max_inner_iterations=1000,
    inner_optimizer="adam",
    dense_dressing=True,
    ilc=True, ilc_cap=48, ilc_rounds=2,
    ground_truth=True,
    results_root=os.path.join(HERE, "results_adam_ilc"),
    tag="IQCC-2x3-dense-adam-ilc", plot=False, log_metrics=True,
    load_model=bool(int(os.environ.get("QSFH_ADAM_RESUME", "0"))),
)
t0 = time.time()
OUT = os.path.join(HERE, "dense_adam_ilc.json")
marks = list(json.load(open(OUT))["marks"]) if os.path.exists(OUT) else []
orig_save = vqe.save_model
def save_and_mark():
    orig_save()
    marks.append({
        "epoch": len(vqe.loss_history["epoch"]),
        "energy": vqe.loss_history["epoch"][-1],
        "error_Ha": vqe.loss_history["epoch"][-1] - vqe.ground_state_energy,
        "elapsed_s": round(time.time() - t0, 1),
    })
    with open(OUT, "w") as f:
        json.dump({"exact": vqe.ground_state_energy,
                   "backend": "dense+ilc", "inner": "adam",
                   "marks": marks}, f, indent=1)
vqe.save_model = save_and_mark
vqe.run()
print("DONE", json.dumps(marks[-1] if marks else {}))
