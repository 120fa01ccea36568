#!/usr/bin/env python
"""Screen EXTENDED operator pools at the current flagship 3x3 state.

The 727-op simplified-pool ansatz is saturated at a 2.46 mHa gap
(L-BFGS-converged, `polish_lbfgs.log`); VERDICT round-2 #1 says growth
must come from richer channels.  This script loads the checkpoint on
CPU float64 and computes ADAPT selection gradients |dE/dtheta| at
theta=0 for four candidate families:

  simplified  - the current pool (what epoch-19 would select)
  same-spin   - ZS-channel scattering with BOTH fermions in the same
                spin sector (the simplified builder only emits
                opposite-spin pairs, ops/pool.py:249-258)
  modified    - the reference's 5 channel-sum Hermitian operators
                (/root/reference/operators/pool.py:257-340)
  general     - all momentum/Sz-conserving anti-Hermitian two-body
                excitations (superset bound: the best any two-body
                generator can do at this state)

The top candidate of each family is cross-checked with a central
finite difference through the actual ansatz rotation, so the screen's
sign/convention cannot fool us.
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
from qsfh_tpu.engine.expectation import PackedPool  # noqa: E402
from qsfh_tpu.engine.gates import generator_rotation  # noqa: E402
from qsfh_tpu.engine.circuits import apply_givens_network_adjoint  # noqa: E402
from qsfh_tpu.ops.jw import jordan_wigner  # noqa: E402
from qsfh_tpu.ops.fermion import FermionOperator, normal_ordered  # noqa: E402
from qsfh_tpu.ops import pool as pool_mod  # noqa: E402


same_spin_pool = pool_mod.hubbard_interaction_pool_same_spin


def general_conserving_pool(Nx, Ny):
    """All anti-Hermitian two-body ops conserving total momentum and Sz.

    Superset diagnostic only (|pool| ~ O(n^4)): includes the simplified
    and same-spin families plus pair (double-occupancy) channels.
    """
    t2i, i2t = pool_mod._k_indexers(Nx, Ny)
    n_sites = Nx * Ny
    dedup = pool_mod._SignDedup()
    ops = []
    # enumerate (a^ b^ c d) with momentum conservation ka+kb = kc+kd and
    # spin pattern preserving Sz
    for sa in (0, 1):
        for sb in (0, 1):
            for ka in range(n_sites):
                for kb in range(n_sites):
                    for kc in range(n_sites):
                        kxa, kya = i2t(ka)
                        kxb, kyb = i2t(kb)
                        kxc, kyc = i2t(kc)
                        kxd, kyd = kxa + kxb - kxc, kya + kyb - kyc
                        for (sc, sd) in (((sa, sb)), ((sb, sa))):
                            idx = (
                                t2i(kxa, kya, sa),
                                t2i(kxb, kyb, sb),
                                t2i(kxc, kyc, sc),
                                t2i(kxd, kyd, sd),
                            )
                            if idx[0] == idx[1] or idx[2] == idx[3]:
                                continue
                            op = normal_ordered(pool_mod._antihermitian_pair(idx))
                            if op.terms and dedup.add(op):
                                ops.append(op)
    return ops


def main():
    vqe = ADAPT(
        n_epoch=0, threshold1=1e-3, threshold2=1e-3,
        x_dimension=3, y_dimension=3, n_electrons=9, n_spin_up=5,
        n_spin_down=4, tunneling=1, coulomb=6, degenerate_subspace=4,
        # the checkpoint's selected_indices index the EXTENDED pool since
        # the same-spin growth phase (commit ba33883) -- loading with the
        # simplified pool would misindex every op past the shared prefix
        pool=pool_mod.hubbard_interaction_pool_extended(3, 3),
        load_model=True, results_root=HERE, plot=False, log_metrics=False,
    )
    p = vqe.problem
    th = jnp.asarray(np.asarray(vqe.params_t, dtype=np.float64))
    indices = tuple(vqe.selected_indices)
    print(f"loaded: {len(indices)} ops | epoch {len(vqe.results['epoch loss'])}",
          flush=True)

    psi_k = vqe._ansatz_k(th, indices)
    psi_r = vqe._to_real(psi_k)
    e0 = float(jnp.real(jnp.vdot(psi_r, p.observables["H"].apply(psi_r))))
    w_r = p.observables["H"].apply(psi_r)
    w_k = apply_givens_network_adjoint(w_r, vqe.n_qubits, p.diagonal, p.decomposition)
    print(f"E0 = {e0:.9f} (ED {vqe.ground_state_energy:.9f}, "
          f"gap {1e3 * (e0 - vqe.ground_state_energy):.4f} mHa)", flush=True)

    def fd_check(qubit_op):
        """Central finite difference of E through the real ansatz rotation."""
        rot = qubit_op.rotation_terms()
        if not rot:
            return 0.0
        eps = 1e-5

        def energy_at(t):
            psi = generator_rotation(psi_k, vqe.n_qubits, rot, jnp.float64(t))
            pr = vqe._to_real(psi)
            return float(jnp.real(jnp.vdot(pr, p.observables["H"].apply(pr))))

        return (energy_at(eps) - energy_at(-eps)) / (2 * eps)

    Nx, Ny = 3, 3
    families = {}
    families["driver_pool"] = vqe.fermion_pool  # extended since ba33883
    families["same_spin"] = same_spin_pool(Nx, Ny)
    families["modified_channels"] = list(
        pool_mod.hubbard_interaction_pool_modified(Nx, Ny).values()
    )
    families["general_conserving"] = general_conserving_pool(Nx, Ny)

    report = {"e0": e0, "ed": float(vqe.ground_state_energy),
              "gap_mha": 1e3 * (e0 - float(vqe.ground_state_energy)),
              "n_ansatz_ops": len(indices), "families": {}}
    channel_names = ["ZS", "ZS2", "W", "BCS", "BCS2"]
    for name, ops in families.items():
        qops = [jordan_wigner(g) for g in ops]
        keep = [(i, q) for i, q in enumerate(qops) if q.rotation_terms()]
        if not keep:
            print(f"{name}: empty after rotation lowering", flush=True)
            continue
        pp = PackedPool([q for _, q in keep], vqe.n_qubits)
        grads = np.abs(np.asarray(pp.screen_scan(psi_k, w_k)))
        order = np.argsort(-grads)
        top = []
        for j in order[:8]:
            label = (channel_names[keep[j][0]]
                     if name == "modified_channels" else str(keep[j][0]))
            top.append({"op": label, "grad": float(grads[j])})
        fd = fd_check(keep[order[0]][1])
        report["families"][name] = {
            "n_ops": len(keep),
            "max_grad": float(grads[order[0]]),
            "fd_dE_dtheta_top1": fd,
            "top": top,
        }
        print(f"{name}: {len(keep)} ops | max |g| = {grads[order[0]]:.3e} "
              f"(fd {fd:+.3e}) | top {[t['op'] for t in top[:5]]}", flush=True)

    out = os.path.join(HERE, "screen_extended.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
