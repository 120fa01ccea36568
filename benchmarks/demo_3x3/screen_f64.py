#!/usr/bin/env python
"""CPU-float64 ADAPT selection screen for the flagship 3x3 run.

Below a ~1e-4 threshold the on-chip c64 screen is deciding at its own
noise floor (VERDICT r3 missing #1): per-gradient errors of ~1e-5 from
the f32 state and the f32 H-apply can bury the real 3e-5..9.5e-5 band the
full-pool f64 screen measures (`screen_extended.json`).  The growth
driver (`continue_grow.py` phase 3) therefore shells out to THIS script
at each selection point: it loads the freshest parameters (in-flight
state preferred), screens the driver's own extended pool entirely in
float64 on CPU, applies the reference selection rule
(`/root/reference/models/adapt_vqe.py:312-317`: |g| >= max(0.1*gmax,
threshold1), descending, stable tie-break), and writes the result JSON to
the path given in argv[1]:

    {"indices": [...], "grads": [...], "gmax": g, "e0": E, "n_ansatz": N}

Exit code 0 with an empty indices list is the legitimate convergence
break.
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qsfh_tpu.algos.adapt import ADAPT  # noqa: E402
from qsfh_tpu.engine.circuits import apply_givens_network_adjoint  # noqa: E402
from qsfh_tpu.ops.pool import hubbard_interaction_pool_extended  # noqa: E402


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        HERE, "screen_f64.json"
    )
    threshold1 = float(os.environ.get("QSFH_SCREEN_THRESHOLD", "3e-5"))
    ratio = float(os.environ.get("QSFH_SCREEN_RATIO", "0.1"))

    vqe = ADAPT(
        n_epoch=0, threshold1=threshold1, threshold2=threshold1,
        x_dimension=3, y_dimension=3, n_electrons=9, n_spin_up=5,
        n_spin_down=4, tunneling=1, coulomb=6, degenerate_subspace=4,
        pool=hubbard_interaction_pool_extended(3, 3),
        load_model=True, results_root=HERE, plot=False, log_metrics=False,
    )

    # freshest parameters win: the runner writes the in-flight state every
    # chunk, the epoch checkpoint only at epoch boundaries
    from qsfh_tpu.algos.adapt_fused import FusedAdaptRunner

    runner = FusedAdaptRunner(vqe, dispatch="stages", df_energy=False)
    inflight = runner.load_inflight()
    if inflight is not None:
        vqe.selected_indices = inflight["selected_indices"]
        vqe.params_t = jnp.asarray(inflight["t"].astype(np.float64))

    th = jnp.asarray(np.asarray(vqe.params_t, np.float64))
    indices = tuple(vqe.selected_indices)
    p = vqe.problem

    psi_k = vqe._ansatz_k(th, indices)
    psi_r = vqe._to_real(psi_k)
    e0 = float(jnp.real(jnp.vdot(psi_r, p.observables["H"].apply(psi_r))))
    w_r = p.observables["H"].apply(psi_r)
    w_k = apply_givens_network_adjoint(
        w_r, vqe.n_qubits, p.diagonal, p.decomposition
    )
    grads = np.abs(np.asarray(vqe.packed_pool.screen_scan(psi_k, w_k)))

    gmax = float(grads.max()) if grads.size else 0.0
    mask = (grads >= gmax * ratio) & (grads >= threshold1)
    chosen = np.flatnonzero(mask)
    order = chosen[np.lexsort((chosen, -np.round(grads[chosen], 12)))]

    result = {
        "indices": [int(i) for i in order],
        "grads": [float(grads[i]) for i in order],
        "gmax": gmax,
        "e0": e0,
        "ed": float(vqe.ground_state_energy),
        "gap_mha": 1e3 * (e0 - float(vqe.ground_state_energy)),
        "n_ansatz": len(indices),
        "threshold1": threshold1,
    }
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(result, f)
    os.replace(tmp, out_path)
    print(
        f"screen_f64: {len(order)} selected (gmax {gmax:.3e}, thr "
        f"{threshold1:g}) at E0 {e0:.9f} ({result['gap_mha']:+.4f} mHa), "
        f"{len(indices)} ansatz ops",
        flush=True,
    )


if __name__ == "__main__":
    main()
