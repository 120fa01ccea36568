#!/usr/bin/env python
"""Variational-floor certificate for the flagship 1719-op ansatz.

VERDICT r4 missing #1 allows two closures: land at <= 1 uHa, or "a
measured convergence-rate extrapolation (with error bars) showing the
1719-op ansatz's variational floor" with ANALYSIS.md-grade rigor.  This
tool produces the measured pieces of that certificate at the current
best parameters:

  1. gradient norm |g| (native f64 engine, parity 4e-15 vs jax stages);
  2. the low end of the Hessian spectrum via Lanczos with full
     reorthogonalization over central-FD Hessian-vector products
     (negative eigenvalues => not a local minimum => more descent
     exists; all-positive => quadratic-basin bound applies);
  3. the Newton decrement ~ (1/2) g^T H^+ g via a capped CG solve --
     the remaining descent available to ANY optimizer inside the
     quadratic basin;
  4. the current gap vs the Lanczos ED ground energy.

floor estimate: gap_now - (1/2) g^T H^+ g, i.e. where the basin bottoms
out.  Writes floor_hessian.json.
"""
import json
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

M_LANCZOS = int(os.environ.get("QSFH_FLOOR_LANCZOS", "80"))
CG_CAP = int(os.environ.get("QSFH_FLOOR_CG", "300"))
OUT = os.path.join(HERE, "floor_hessian.json")


def main():
    vqe = ADAPT(
        n_epoch=0, threshold1=1e-3, threshold2=1e-3,
        x_dimension=3, y_dimension=3, n_electrons=9, n_spin_up=5,
        n_spin_down=4, tunneling=1, coulomb=6, degenerate_subspace=4,
        pool=hubbard_interaction_pool_extended(3, 3),
        load_model=True, results_root=HERE, plot=False, log_metrics=False,
    )
    ed = float(vqe.ground_state_energy)
    prog = Rot64Program.from_adapt(vqe)
    psi0_r = initial_state_reim(vqe)
    psi0 = psi0_r[0] + 1j * psi0_r[1]

    x = np.asarray(vqe.params_t, np.float64)
    best_path = os.path.join(HERE, "polish_fast_best.npz")
    if os.path.exists(best_path):
        d = np.load(best_path)
        if d["t"].shape == x.shape and float(d["energy"]) < \
                prog.energy(x, psi0):
            x = np.asarray(d["t"], np.float64)

    t0 = time.time()
    n_eval = [0]

    def write_partial(rec):
        # incremental checkpointing: a sandbox death mid-CG must not lose
        # the decrement series (it IS the extrapolation data)
        with open(OUT + ".tmp", "w") as fh:
            json.dump(rec, fh, indent=1)
        os.replace(OUT + ".tmp", OUT)

    def vg(th):
        n_eval[0] += 1
        return prog.value_and_grad(th, psi0)

    def hvp(v):
        vn = float(np.linalg.norm(v))
        h = 1e-6 / vn
        _, gp = vg(x + h * v)
        _, gm = vg(x - h * v)
        return (gp - gm) / (2.0 * h)

    e, g = vg(x)
    gap = e - ed
    print(f"point: E {e:+.12f} | gap {gap*1e6:.3f} uHa | "
          f"gnorm {np.linalg.norm(g):.3e}", flush=True)

    # -- Lanczos with full reorthogonalization ---------------------------
    n = len(x)
    rng = np.random.default_rng(7)
    q = rng.normal(size=n)
    q /= np.linalg.norm(q)
    Q = [q]
    alphas, betas = [], []
    for j in range(M_LANCZOS):
        w = hvp(Q[-1])
        a = float(np.dot(Q[-1], w))
        alphas.append(a)
        w = w - a * Q[-1] - (betas[-1] * Q[-2] if betas else 0.0)
        # full reorthogonalization (cheap next to the HVPs)
        for qq in Q:
            w -= np.dot(qq, w) * qq
        b = float(np.linalg.norm(w))
        if b < 1e-14:
            break
        betas.append(b)
        Q.append(w / b)
        if (j + 1) % 20 == 0:
            T = np.diag(alphas) + np.diag(betas[: len(alphas) - 1], 1) + \
                np.diag(betas[: len(alphas) - 1], -1)
            ev = np.linalg.eigvalsh(T)
            print(f"  lanczos {j+1}: ritz lo {ev[:4]} hi {ev[-2:]}",
                  flush=True)
    T = np.diag(alphas) + np.diag(betas[: len(alphas) - 1], 1) + \
        np.diag(betas[: len(alphas) - 1], -1)
    ritz = np.linalg.eigvalsh(T)
    write_partial({
        "time": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "status": "lanczos_done",
        "n_params": n, "E": e, "ed": ed, "gap_uHa": gap * 1e6,
        "gnorm": float(np.linalg.norm(g)),
        "lanczos_m": len(alphas),
        "ritz_low": [float(v) for v in ritz[:8]],
        "ritz_high": [float(v) for v in ritz[-3:]],
        "min_ritz": float(ritz[0]),
        "evals": n_eval[0],
        "wall_s": round(time.time() - t0, 1),
    })

    # -- Newton decrement via capped (optionally Jacobi-PCG) CG ----------
    minv = None
    pre = os.environ.get("QSFH_FLOOR_PRECOND", os.path.join(HERE, "hdiag.npz"))
    if pre and os.path.exists(pre):
        dd = np.abs(np.asarray(np.load(pre)["diag"], np.float64))
        floor_m = max(1e-8, 1e-7 * float(np.max(dd)))
        minv = 1.0 / np.maximum(dd, floor_m)
        print(f"jacobi preconditioner active (|H_kk| spread "
              f"{dd.min():.2e}..{dd.max():.2e})", flush=True)
    b_vec = -g
    p = np.zeros_like(b_vec)
    r = b_vec.copy()
    z = r * minv if minv is not None else r
    d_vec = z.copy()
    rz = float(np.dot(r, z))
    rr = float(np.dot(r, r))
    b_norm = float(np.linalg.norm(b_vec))
    cg_iters = 0
    decrement_series = []
    while cg_iters < CG_CAP and np.sqrt(rr) > 1e-3 * b_norm:
        Hd = hvp(d_vec)
        dHd = float(np.dot(d_vec, Hd))
        if dHd <= 1e-16 * float(np.dot(d_vec, d_vec)):
            break
        alpha = rz / dHd
        p += alpha * d_vec
        r -= alpha * Hd
        z = r * minv if minv is not None else r
        rz_new = float(np.dot(r, z))
        d_vec = z + (rz_new / rz) * d_vec
        rz = rz_new
        rr = float(np.dot(r, r))
        cg_iters += 1
        if cg_iters % 10 == 0:
            dec = 0.5 * float(np.dot(b_vec, p))
            decrement_series.append(dec)
            print(f"  cg {cg_iters}: decrement {dec*1e6:.4f} uHa", flush=True)
            write_partial({
                "time": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "status": f"cg_{cg_iters}",
                "n_params": n, "E": e, "ed": ed, "gap_uHa": gap * 1e6,
                "gnorm": float(np.linalg.norm(g)),
                "lanczos_m": len(alphas),
                "ritz_low": [float(v) for v in ritz[:8]],
                "min_ritz": float(ritz[0]),
                "cg_iters": cg_iters,
                "newton_decrement_uHa": dec * 1e6,
                "decrement_series_uHa": [d * 1e6 for d in decrement_series],
                "floor_estimate_uHa": (gap - dec) * 1e6,
                "evals": n_eval[0],
                "wall_s": round(time.time() - t0, 1),
            })
    decrement = 0.5 * float(np.dot(b_vec, p))
    # save the CG solution: it IS the (truncated) Newton step; a follow-up
    # line search along it realizes the measured decrement as actual
    # descent (polish_newton2.py duplicates this solve at the same HVP
    # cost otherwise)
    np.savez(os.path.join(HERE, "floor_step.npz.tmp.npz"), x=x, p=p,
             decrement=decrement)
    os.replace(os.path.join(HERE, "floor_step.npz.tmp.npz"),
               os.path.join(HERE, "floor_step.npz"))

    rec = {
        "time": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "status": "done",
        "git": os.popen(f"git -C {ROOT} rev-parse --short HEAD").read().strip(),
        "n_params": n, "E": e, "ed": ed, "gap_uHa": gap * 1e6,
        "gnorm": float(np.linalg.norm(g)),
        "lanczos_m": len(alphas),
        "ritz_low": [float(v) for v in ritz[:8]],
        "ritz_high": [float(v) for v in ritz[-3:]],
        "min_ritz": float(ritz[0]),
        "cg_iters": cg_iters,
        "newton_decrement_uHa": decrement * 1e6,
        "decrement_series_uHa": [d * 1e6 for d in decrement_series],
        "floor_estimate_uHa": (gap - decrement) * 1e6,
        "evals": n_eval[0],
        "wall_s": round(time.time() - t0, 1),
    }
    with open(OUT + ".tmp", "w") as fh:
        json.dump(rec, fh, indent=1)
    os.replace(OUT + ".tmp", OUT)
    print(json.dumps({k: rec[k] for k in
                      ("gap_uHa", "min_ritz", "newton_decrement_uHa",
                       "floor_estimate_uHa")}), flush=True)


if __name__ == "__main__":
    main()
