#!/usr/bin/env python
"""Why does exact-dressing iQCC plateau at ~0.248 Ha on 2x3?

The dense campaign (run_dense_b.py / dense.json) shows per-epoch energy
gains decaying GEOMETRICALLY (tail ratio ~0.58) toward a fixed point at
~0.2477 Ha above ED -- i.e. the iteration converges, but not to the
ground state.  This diagnostic loads the plateau checkpoint and measures
what the selection step sees there:

  * size of the DIS (first-order flip directions of the dressed H),
  * the full gradient spectrum at the QMF reference (g_max, counts
    above the selection cuts),
  * the selection rule's actual take (iqcc.py:123-127 parity rule).

If g_max is still large while per-epoch gains are ~0.5 mHa, the plateau
is a CURVATURE/overlap limitation of single-generator QCC steps from a
product state (the known first-order-QCC saturation the iQCC-ILC papers
address), not selection dry-up and not truncation (dense dressing is
exact).  Output appended to dense.json under "plateau_diagnostic".
"""
import json, os, sys, time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
os.chdir(HERE)

import numpy as np
from qsfh_tpu.algos.iqcc import IQCC, product_state
from qsfh_tpu.engine.expectation import PackedPool
from qsfh_tpu.ops.dense_dressing import dense_dis_generators
from qsfh_tpu.ops.lattice import fermi_hubbard

vqe = IQCC(
    hamiltonian=fermi_hubbard(2, 3, 1.0, 4.0, periodic=True, spinless=False),
    n_epoch=40, lr=1e-2, threshold=5e-3,
    dense_dressing=True, ground_truth=True,
    results_root=os.path.join(HERE, "results_dense"),
    tag="IQCC-2x3-dense", plot=False, log_metrics=False,
    load_model=True,
)
t0 = time.time()
n_ep = len(vqe.loss_history["epoch"])
e_last = vqe.loss_history["epoch"][-1]
print(f"checkpoint: {n_ep} epochs, E={e_last:.6f}, "
      f"err={e_last - vqe.ground_state_energy:.6f} Ha, "
      f"{len(vqe.selected_ops)} ops folded in")

dis, nnz = dense_dis_generators(vqe._dense_h, vqe.n_qubits)
print(f"DIS size {len(dis)} flip sets, dressed nnz {nnz} "
      f"(+{time.time()-t0:.0f}s)")

pool = PackedPool([0.5 * P for _, P in dis], vqe.n_qubits)
from qsfh_tpu.engine.expectation import Observable
obs = Observable.dense(np.asarray(vqe._dense_h), vqe.n_qubits) \
    if hasattr(Observable, "dense") else None
if obs is None:
    # apply the dense H directly: w = H psi
    psi = np.asarray(product_state(vqe.params["theta"], vqe.params["phi"],
                                   vqe.n_qubits, vqe.dtype))
    w = vqe._dense_h @ psi
    import jax.numpy as jnp
    grads = np.abs(np.asarray(pool.screen_scan(jnp.asarray(psi), jnp.asarray(w))))
else:
    psi = product_state(vqe.params["theta"], vqe.params["phi"], vqe.n_qubits, vqe.dtype)
    grads = np.abs(np.asarray(pool.screen_scan(psi, obs.apply_auto(psi))))

g_sorted = np.sort(grads)[::-1]
g_max = float(g_sorted[0])
ratio, thr = vqe.ratio, vqe.threshold
n_rule = int((grads > g_max * ratio).sum()) if g_max * ratio > thr \
    else int((grads > thr).sum())
diag = {
    "at_epoch": n_ep,
    "error_Ha": e_last - vqe.ground_state_energy,
    "dis_size": len(dis),
    "dressed_nnz": int(nnz),
    "g_max": g_max,
    "g_top10": [round(float(g), 6) for g in g_sorted[:10]],
    "n_above_gmax_ratio": int((grads > g_max * ratio).sum()),
    "n_above_threshold": int((grads > thr).sum()),
    "n_selected_by_rule": n_rule,
    "g_l2": float(np.linalg.norm(grads)),
    "elapsed_s": round(time.time() - t0, 1),
}
print(json.dumps(diag, indent=1))
path = os.path.join(HERE, "dense.json")
d = json.load(open(path))
d["plateau_diagnostic"] = diag
with open(path, "w") as f:
    json.dump(d, f, indent=1)
print("written to dense.json")
