#!/usr/bin/env python
"""Variational-floor analysis for the flagship 3x3 ADAPT ansatz.

VERDICT r3 next #1 asks for "an honest statement of distance to 1e-6 Ha,
or a rigorous floor argument".  This script quantifies, in CPU float64,
what remains available to the growth procedure at the converged state:

1. full extended-pool f64 screen at the checkpoint state (the gradients
   ADAPT would act on: g_max and the band above the phase-3 threshold);
2. the SUBSPACE CEILING: lowest generalized eigenvalue of H restricted
   to span{|psi>, G_1|psi>, ..., G_M|psi>} over the top-M screened pool
   directions -- an upper bound on the gain of ANY single ADAPT growth
   step built from this pool (every first-order direction made
   available at once, coefficients chosen optimally), the 18q analog of
   the iQCC 2x3 ceiling analysis (demo_iqcc_2x3_r4/ANALYSIS.md);
3. a second-order perturbative estimate sum_k g_k^2 / (E_k - E0) over
   the same directions for scale.

Writes floor_subspace.json.  M is memory-bounded: each column is a
2^18 complex128 vector (4 MB), M=256 -> ~1 GB working set.
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from qsfh_tpu.algos.adapt import ADAPT  # noqa: E402
from qsfh_tpu.engine.circuits import apply_givens_network_adjoint  # noqa: E402
from qsfh_tpu.ops.pool import hubbard_interaction_pool_extended  # noqa: E402

M = int(os.environ.get("QSFH_FLOOR_M", "256"))


def main():
    t0 = time.time()
    vqe = ADAPT(
        n_epoch=0, threshold1=3e-5, threshold2=3e-5,
        x_dimension=3, y_dimension=3, n_electrons=9, n_spin_up=5,
        n_spin_down=4, tunneling=1, coulomb=6, degenerate_subspace=4,
        pool=hubbard_interaction_pool_extended(3, 3),
        load_model=True, results_root=HERE, plot=False, log_metrics=False,
    )
    th = jnp.asarray(np.asarray(vqe.params_t, np.float64))
    indices = tuple(vqe.selected_indices)
    p = vqe.problem
    ed = float(vqe.ground_state_energy)

    psi_k = vqe._ansatz_k(th, indices)
    psi_r = vqe._to_real(psi_k)
    H = p.observables["H"]
    w_r = H.apply(psi_r)
    e0 = float(jnp.real(jnp.vdot(psi_r, w_r)))
    print(f"state built: E0 {e0:.9f}, gap {1e3*(e0-ed):.4f} mHa "
          f"(+{time.time()-t0:.0f}s)", flush=True)

    # 1. full-pool screen (gradients in the ansatz frame)
    w_k = apply_givens_network_adjoint(w_r, vqe.n_qubits, p.diagonal,
                                       p.decomposition)
    grads = np.abs(np.asarray(vqe.packed_pool.screen_scan(psi_k, w_k)))
    order = np.argsort(-grads, kind="stable")[:M]
    gmax = float(grads.max())
    print(f"screen: gmax {gmax:.3e}, above 3e-5: "
          f"{int((grads >= 3e-5).sum())}, above 1e-5: "
          f"{int((grads >= 1e-5).sum())} (+{time.time()-t0:.0f}s)", flush=True)

    # 2. subspace ceiling over the top-M pool directions: columns
    #    G_k|psi> in the k frame, mapped to the physical frame by the
    #    SAME Givens network as the state (frames are unitarily related,
    #    so the eigenproblem can live entirely in the k frame with H_k
    #    applies: <v_i|H|v_j> = <v_i^k|H^k|v_j^k>; we use physical-frame
    #    H on physical-frame columns to reuse H.apply).
    from qsfh_tpu.engine.expectation import apply_paulisum

    psi_r64 = np.asarray(psi_r)
    cols = [psi_r64]
    for k in order:
        gk = apply_paulisum(psi_k, vqe.n_qubits, vqe.qubit_pool[int(k)])
        gk_r = np.asarray(vqe._to_real(jnp.asarray(gk)))
        cols.append(gk_r)
    V = np.stack(cols, axis=1)
    print(f"V built: {V.shape} (+{time.time()-t0:.0f}s)", flush=True)
    W = np.empty_like(V)
    for j in range(V.shape[1]):
        W[:, j] = np.asarray(H.apply(jnp.asarray(V[:, j])))
    A = V.conj().T @ W
    S = V.conj().T @ V
    A = 0.5 * (A + A.conj().T)
    S = 0.5 * (S + S.conj().T)
    s_eval, s_evec = np.linalg.eigh(S)
    keep = s_eval > 1e-10 * s_eval.max()
    X = s_evec[:, keep] / np.sqrt(s_eval[keep])
    Ao = X.conj().T @ A @ X
    e_sub = float(np.linalg.eigvalsh(0.5 * (Ao + Ao.conj().T))[0])
    print(f"subspace ceiling: {e_sub:.9f} (gain {1e3*(e0-e_sub):.4f} mHa, "
          f"remaining {1e3*(e_sub-ed):.4f} mHa) (+{time.time()-t0:.0f}s)",
          flush=True)

    # 3. PT2-style scale estimate over the same columns
    g = grads[order]
    Bd = np.real(np.einsum("ik,ik->k", V[:, 1:].conj(), W[:, 1:]))
    Sd = np.real(np.einsum("ik,ik->k", V[:, 1:].conj(), V[:, 1:]))
    denom = Bd / np.maximum(Sd, 1e-300) - e0
    pt2 = float(np.sum((g ** 2) / np.maximum(denom, 1e-9)))

    out = {
        "time": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_params": len(indices),
        "e0_f64": e0,
        "ed_energy": ed,
        "gap_mha": 1e3 * (e0 - ed),
        "gmax": gmax,
        "n_above_3e-5": int((grads >= 3e-5).sum()),
        "n_above_1e-5": int((grads >= 1e-5).sum()),
        "subspace_M": int(M),
        "subspace_energy": e_sub,
        "subspace_gain_mha": 1e3 * (e0 - e_sub),
        "subspace_remaining_mha": 1e3 * (e_sub - ed),
        "pt2_estimate_mha": 1e3 * pt2,
        "elapsed_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(HERE, "floor_subspace.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
