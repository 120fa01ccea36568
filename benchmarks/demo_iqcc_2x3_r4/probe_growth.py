#!/usr/bin/env python
"""Probe: uncapped 2x3 iQCC term growth + per-epoch wall time (4 epochs).

Decides the round-4 strategy for VERDICT r3 next #3: eps-budget symbolic
run vs accuracy-vs-cap frontier.
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
    n_epoch=4, lr=1e-2, threshold=5e-3,
    max_terms=None, compaction_eps=None,
    ground_truth=True,
    results_root=os.path.join(HERE, "probe_results"),
    tag="IQCC-2x3-probe", plot=False, log_metrics=False,
)
t0 = time.time()
marks = []
orig_save = vqe.save_model
def save_and_mark():
    orig_save()
    marks.append({"epoch": len(vqe.loss_history["epoch"]),
                  "terms": len(vqe.current_hamiltonian),
                  "energy": vqe.loss_history["epoch"][-1],
                  "elapsed_s": round(time.time() - t0, 1)})
    with open(os.path.join(HERE, "probe_growth.json"), "w") as f:
        json.dump({"exact": vqe.ground_state_energy, "marks": marks}, f, indent=1)
vqe.save_model = save_and_mark
vqe.run()
print(json.dumps(marks, indent=1))
