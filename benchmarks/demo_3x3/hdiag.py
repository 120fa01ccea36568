#!/usr/bin/env python
"""Hessian diagonal of the flagship energy by central FD of ENERGY-only
native evals (2 per coordinate, ~1.6 s each), for Jacobi preconditioning
of the deep Newton-CG polish.

The unpreconditioned deep solves converge geometrically at ~0.78/cycle:
CG-350 against a kappa ~ 1e6-1e7 spectrum only shaves the resolved band.
The flat-valley directions are expected to be diagonal-visible (tiny
d2E/dtheta_k^2 for the near-redundant rotations), so M = diag(max(|H_kk|,
eps)) should collapse the effective kappa.

Writes hdiag.npz {diag, x, E0}.  Restartable: appends progress to
hdiag.partial.npy every 100 coordinates.
"""
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, "..", "..")
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from qsfh_tpu.algos.adapt import ADAPT  # noqa: E402
from qsfh_tpu.algos.adapt_fused import initial_state_reim  # noqa: E402
from qsfh_tpu.native.statevec import Rot64Program  # noqa: E402
from qsfh_tpu.ops.pool import hubbard_interaction_pool_extended  # noqa: E402

H_FD = float(os.environ.get("QSFH_HDIAG_H", "0.05"))
OUT = os.path.join(HERE, "hdiag.npz")
PARTIAL = os.path.join(HERE, "hdiag.partial.npy")


def main():
    vqe = ADAPT(
        n_epoch=0, threshold1=1e-3, threshold2=1e-3,
        x_dimension=3, y_dimension=3, n_electrons=9, n_spin_up=5,
        n_spin_down=4, tunneling=1, coulomb=6, degenerate_subspace=4,
        pool=hubbard_interaction_pool_extended(3, 3),
        load_model=True, results_root=HERE, plot=False, log_metrics=False,
    )
    prog = Rot64Program.from_adapt(vqe)
    psi0_r = initial_state_reim(vqe)
    psi0 = psi0_r[0] + 1j * psi0_r[1]

    x = np.asarray(vqe.params_t, np.float64)
    bp = os.path.join(HERE, "polish_fast_best.npz")
    if os.path.exists(bp):
        d = np.load(bp)
        if d["t"].shape == x.shape:
            x = np.asarray(d["t"], np.float64)
    n = len(x)
    e0 = prog.energy(x, psi0)
    diag = np.full(n, np.nan)
    start = 0
    if os.path.exists(PARTIAL):
        prev = np.load(PARTIAL)
        if prev.shape == (n,):
            diag = prev
            start = int(np.sum(~np.isnan(diag)))
            print(f"resuming at coordinate {start}", flush=True)
    t0 = time.time()
    for k in range(start, n):
        xp = x.copy()
        xp[k] += H_FD
        xm = x.copy()
        xm[k] -= H_FD
        diag[k] = (prog.energy(xp, psi0) - 2.0 * e0 +
                   prog.energy(xm, psi0)) / (H_FD * H_FD)
        if (k + 1) % 100 == 0:
            np.save(PARTIAL + ".tmp.npy", diag)
            os.replace(PARTIAL + ".tmp.npy", PARTIAL)
            el = time.time() - t0
            print(f"hdiag {k+1}/{n} | {el:.0f}s | "
                  f"min {np.nanmin(diag):.3e} max {np.nanmax(diag):.3e}",
                  flush=True)
    np.savez(OUT + ".tmp.npz", diag=diag, x=x, E0=e0, h=H_FD)
    os.replace(OUT + ".tmp.npz", OUT)
    pos = diag[diag > 0]
    print(f"done: {n} coords | positive {len(pos)} | "
          f"min|H_kk| {np.min(np.abs(diag)):.3e} | "
          f"median {np.median(np.abs(diag)):.3e} | "
          f"max {np.max(np.abs(diag)):.3e}", flush=True)


if __name__ == "__main__":
    main()
