#!/usr/bin/env python
"""iQCC 2x3 (12q), round 4: eps-budget compaction + 60k-term cap.

VERDICT r3 next #3: the round-3 20k hard cap silently destroyed physics
(energy degraded monotonically after epoch 4).  This run triples the cap,
adds the per-epoch error-budget drop first (its cumulative operator-norm
bound rigorously bounds the total eigenvalue shift, ops/dressing.py), and
reports best-energy-vs-bound per epoch so the frontier point is honest:
observed_error <= true_variational_error + cumulative_bound.
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

MAX_TERMS = int(os.environ.get("QSFH_IQCC_MAX_TERMS", "60000"))
EPS = float(os.environ.get("QSFH_IQCC_EPS", "2e-4"))

vqe = IQCC(
    hamiltonian=fermi_hubbard(2, 3, 1.0, 4.0, periodic=True, spinless=False),
    n_epoch=20, lr=1e-2, threshold=5e-3,
    max_terms=MAX_TERMS, compaction_eps=EPS,
    ground_truth=True,
    results_root=os.path.join(HERE, "results_eps"),
    tag=f"IQCC-2x3-eps-{MAX_TERMS}",
    plot=False, log_metrics=True,
)
t0 = time.time()
marks = []
orig_save = vqe.save_model
def save_and_mark():
    orig_save()
    marks.append({
        "epoch": len(vqe.loss_history["epoch"]),
        "terms": len(vqe.current_hamiltonian),
        "energy": vqe.loss_history["epoch"][-1],
        "cumulative_bound_Ha": vqe.compaction_bound,
        "error_Ha": vqe.loss_history["epoch"][-1] - vqe.ground_state_energy,
        "elapsed_s": round(time.time() - t0, 1),
    })
    with open(os.path.join(HERE, f"eps_{MAX_TERMS}.json"), "w") as f:
        json.dump({"exact": vqe.ground_state_energy,
                   "max_terms": MAX_TERMS, "eps": EPS,
                   "marks": marks}, f, indent=1)
vqe.save_model = save_and_mark
vqe.run()
print("DONE", json.dumps(marks[-1] if marks else {}))
