#!/usr/bin/env python
"""C4-irrep decomposition of the converged 3x3 demo states.

For each flagship 3x3 demo (ADAPT in demo_3x3, HVA in demo_hva_3x3):
resolve the cached degenerate ground manifold into labeled s/px/py/d
eigenstates (linalg/symmetry.py -- the sign-correct version of the
construction the reference left dead-commented at
/root/reference/linalg/exact_diagonalization.py:54-179), reconstruct the
trained variational state from the saved checkpoint, and report which
symmetry sector the optimizer actually converged into.  Writes
``irrep_weights.json`` next to each demo.

Physics beyond the reference: its fidelity is a single scalar against the
whole 4-dim manifold; this resolves *where inside the manifold* the
variational state lives.
"""
import os
import sys
import json

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from qsfh_tpu.linalg.symmetry import symmetry_adapted_states, irrep_weights


def labeled_manifold(manifold_states, nx, ny, seed=0):
    """Resolve cached Gram-Schmidt manifold states into irrep members.

    Seeds the character projection with the Lanczos ground vector; if any
    irrep norm is tiny (non-generic seed), retries with random unit
    combinations of the cached manifold frame.
    """
    rng = np.random.default_rng(seed)
    seeds = [np.asarray(manifold_states[0])]
    for _ in range(4):
        c = rng.normal(size=len(manifold_states)) + 1j * rng.normal(size=len(manifold_states))
        c /= np.linalg.norm(c)
        seeds.append(sum(ci * np.asarray(v) for ci, v in zip(c, manifold_states)))
    for psi0 in seeds:
        states, norms = symmetry_adapted_states(psi0, nx, ny)
        if len(states) == 4:
            return states, norms
    raise RuntimeError(f"could not resolve all four irreps; norms={norms}")


def analyze(demo_dir, make_driver):
    vqe = make_driver(demo_dir)
    energy, manifold = vqe.problem.ground_state(degenerate=True, n_states=4)
    states, norms = labeled_manifold(manifold, 3, 3)
    psi = np.asarray(vqe.state())
    w = irrep_weights(psi, states)
    total = sum(w.values())
    out = {
        "demo": os.path.basename(demo_dir),
        "ed_energy": energy,
        "irrep_seed_norms": {k: round(v, 8) for k, v in norms.items()},
        "irrep_weights": {k: round(v, 8) for k, v in w.items()},
        "manifold_fidelity": round(total, 8),
        "dominant_irrep": max(w, key=w.get),
        "epochs_analyzed": _epochs(vqe),
    }
    path = os.path.join(demo_dir, "irrep_weights.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    return out


def _epochs(vqe):
    for key in ("epoch loss", "loss"):
        if key in getattr(vqe, "results", {}):
            return len(vqe.results[key])
    return None


def make_adapt(demo_dir):
    from qsfh_tpu.algos.adapt import ADAPT

    os.chdir(demo_dir)
    return ADAPT(
        n_epoch=0, threshold1=1e-3, threshold2=1e-3,
        x_dimension=3, y_dimension=3, n_electrons=9, n_spin_up=5, n_spin_down=4,
        tunneling=1, coulomb=6, degenerate_subspace=4,
        load_model=True, results_root=demo_dir, plot=False, log_metrics=False,
    )


def make_hva(demo_dir):
    from qsfh_tpu.algos.hva import HVA

    os.chdir(demo_dir)
    return HVA(
        n_epoch=0, reps=10, lr=1e-2,
        x_dimension=3, y_dimension=3, n_electrons=9, n_spin_up=5, n_spin_down=4,
        tunneling=1, coulomb=6, degenerate_subspace=4,
        load_model=True, results_root=demo_dir, plot=False, log_metrics=False,
    )


if __name__ == "__main__":
    targets = sys.argv[1:] or ["demo_3x3", "demo_hva_3x3"]
    for name in targets:
        demo = os.path.join(HERE, name)
        maker = make_adapt if "hva" not in name else make_hva
        try:
            analyze(demo, maker)
        except Exception as exc:  # keep going: demos may be mid-flight
            print(f"{name}: analysis failed: {exc!r}")
