#!/usr/bin/env python
"""Instrumented damped Newton-CG polish on the native f64 engine.

scipy's Newton-CG runs its inner CG solve without visibility or an
iteration cap (forcing-criterion only), which at 1719 parameters and a
near-singular VQE Hessian can burn hundreds of HVPs before the first
outer step.  This driver owns the loop:

  outer: g = grad (1 native eval, ~5-15 s)
         p = Steihaug-CG solve of H p = -g, capped at QSFH_NCG_CAP HVPs
             (each HVP = 2 central-difference native evals), stopping on
             negative curvature or relative residual <= QSFH_NCG_ETA
         backtracking line search along p (up to 10 halvings)
         log E / gap / gnorm / cg iters / step to polish_newton2.jsonl

The VQE Hessian near the minimum is expected near-singular (redundant
directions in a 1719-parameter ansatz); Steihaug-CG only ever uses
positive-curvature information, so singular modes are harmless.

Exit: gap <= QSFH_NCG_TARGET (default 0.9e-6 Ha), QSFH_NCG_DEADLINE, or
3 outer iterations with no meaningful improvement.  On exit: save best,
verify with the jax-f64 stages (independent path), update checkpoint,
re-anchor.
"""
import json
import os
import subprocess
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

CG_CAP = int(os.environ.get("QSFH_NCG_CAP", "100"))
CLEANUP_ITERS = int(os.environ.get("QSFH_NCG_CLEANUP", "40"))
ETA = float(os.environ.get("QSFH_NCG_ETA", "0.1"))
PRECOND = os.environ.get("QSFH_NCG_PRECOND", "")
TARGET_HA = float(os.environ.get("QSFH_NCG_TARGET", "0.9e-6"))
DEADLINE_S = float(os.environ.get("QSFH_NCG_DEADLINE", "1e9"))
FD_EPS = float(os.environ.get("QSFH_NCG_EPS", "1e-6"))
LOG = os.path.join(HERE, "polish_newton2.jsonl")
BEST = os.path.join(HERE, "polish_fast_best.npz")  # shared with polish_fast


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
    for cand in (os.path.join(HERE, "polish_cpu64_best.npz"), BEST):
        if os.path.exists(cand):
            d = np.load(cand)
            if d["t"].shape == x.shape and float(d["energy"]) < \
                    prog.energy(x, psi0):
                x = np.asarray(d["t"], np.float64)
                print(f"warm start from {os.path.basename(cand)} "
                      f"(E {float(d['energy']):+.12f})", flush=True)

    t0 = time.time()
    n_eval = [0]

    def vg(th):
        n_eval[0] += 1
        return prog.value_and_grad(th, psi0)

    def hvp(th, v, g0=None):
        # central difference: 2 evals (forward-diff with g0 would halve
        # cost at ~1e-2 relative HVP error; central keeps CG stable)
        vn = float(np.linalg.norm(v))
        if vn == 0.0:
            return np.zeros_like(v)
        h = FD_EPS / vn
        _, gp = vg(th + h * v)
        _, gm = vg(th - h * v)
        return (gp - gm) / (2.0 * h)

    e, g = vg(x)
    best = {"e": e, "x": x.copy()}
    print(f"start: E {e:+.12f} | gap {1e3*(e-ed):+.6f} mHa | "
          f"gnorm {np.linalg.norm(g):.3e} | {prog.n_params} params", flush=True)

    # entry cleanup: if the warm-start point sits on a valley wall (high
    # gnorm from an overshot Newton step), descend cheaply first
    if CLEANUP_ITERS > 0 and float(np.linalg.norm(g)) > 2e-3:
        from scipy.optimize import minimize as _min

        res = _min(lambda t: vg(t), x, jac=True, method="L-BFGS-B",
                   options=dict(maxiter=CLEANUP_ITERS, maxcor=50, ftol=0.0,
                                gtol=1e-12, maxls=40))
        if res.fun < e:
            x, e = np.asarray(res.x, np.float64), float(res.fun)
            _, g = vg(x)
            best = {"e": e, "x": x.copy()}
            np.savez(BEST + ".tmp.npz", t=x, energy=e)
            os.replace(BEST + ".tmp.npz", BEST)
        print(f"entry cleanup: E {e:+.12f} | gap {1e3*(e-ed):+.6f} mHa | "
              f"gnorm {np.linalg.norm(g):.3e}", flush=True)

    # Jacobi preconditioner from the FD Hessian diagonal (hdiag.py):
    # unpreconditioned deep solves converge at ~0.78/cycle against a
    # kappa ~ 1e6-1e7 spectrum; M = max(|H_kk|, floor) collapses the
    # diagonal-visible part of that spread
    minv = None
    if PRECOND and os.path.exists(PRECOND):
        dd = np.abs(np.asarray(np.load(PRECOND)["diag"], np.float64))
        floor = max(1e-8, 1e-7 * float(np.max(dd)))
        minv = 1.0 / np.maximum(dd, floor)
        print(f"jacobi preconditioner: |H_kk| in "
              f"[{dd.min():.3e}, {dd.max():.3e}], floor {floor:.1e}",
              flush=True)

    stall = 0
    outer = 0
    while True:
        outer += 1
        # -- (preconditioned) Steihaug-CG on H p = -g ---------------------
        b = -g
        p = np.zeros_like(b)
        r = b.copy()
        z = r * minv if minv is not None else r
        d = z.copy()
        rz = float(np.dot(r, z))
        rr = float(np.dot(r, r))
        b_norm = float(np.linalg.norm(b))
        cg_iters = 0
        neg_curv = False
        while cg_iters < CG_CAP and np.sqrt(rr) > ETA * b_norm:
            Hd = hvp(x, d)
            dHd = float(np.dot(d, Hd))
            if dHd <= 1e-16 * float(np.dot(d, d)):
                neg_curv = True
                if cg_iters == 0:
                    p = b.copy()  # steepest descent fallback
                break
            alpha = rz / dHd
            p += alpha * d
            r -= alpha * Hd
            z = r * minv if minv is not None else r
            rz_new = float(np.dot(r, z))
            d = z + (rz_new / rz) * d
            rz = rz_new
            rr = float(np.dot(r, r))
            cg_iters += 1

        # -- backtracking line search -------------------------------------
        scale = 1.0
        accepted = False
        e_prev = e
        for _ in range(10):
            e_try, g_try = vg(x + scale * p)
            if e_try < e:
                x = x + scale * p
                e, g = e_try, g_try
                accepted = True
                break
            scale *= 0.5
        gap = e - ed
        rec = {
            "outer": outer, "E": e, "gap_mHa": 1e3 * gap,
            "gnorm": float(np.linalg.norm(g)), "cg_iters": cg_iters,
            "neg_curv": neg_curv, "step_scale": scale if accepted else 0.0,
            "evals": n_eval[0], "elapsed_s": round(time.time() - t0, 1),
        }
        with open(LOG, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(f"[newton2] outer {outer:3d} | E {e:+.12f} | gap "
              f"{rec['gap_mHa']:+.6f} mHa | gnorm {rec['gnorm']:.3e} | "
              f"cg {cg_iters}{' NC' if neg_curv else ''} | step {scale:g} | "
              f"{rec['evals']} evals | {rec['elapsed_s']:.0f}s", flush=True)
        if e < best["e"]:
            best = {"e": e, "x": x.copy()}
            np.savez(BEST + ".tmp.npz", t=x, energy=e)
            os.replace(BEST + ".tmp.npz", BEST)
        if not accepted or (e_prev - e) < 1e-10:
            stall += 1  # rejected step, or accepted gain < 0.1 nHa
        else:
            stall = 0
        if gap <= TARGET_HA:
            print(f"TARGET reached: gap {gap*1e6:.3f} uHa", flush=True)
            break
        if stall >= 3:
            print("stalled: 3 outer iterations without improvement", flush=True)
            break
        if time.time() - t0 > DEADLINE_S:
            print("deadline", flush=True)
            break

        # -- L-BFGS cleanup between deep Newton outers --------------------
        # a long Newton step along the basin's flat axes overshoots into a
        # valley wall (observed: gap -4.3 uHa but gnorm 8e-4 -> 9e-3 at
        # step 0.25); a short cheap L-BFGS run descends the wall before
        # the next expensive deep solve
        if CLEANUP_ITERS > 0:
            from scipy.optimize import minimize as _min

            res = _min(lambda t: vg(t), x, jac=True, method="L-BFGS-B",
                       options=dict(maxiter=CLEANUP_ITERS, maxcor=50,
                                    ftol=0.0, gtol=1e-12, maxls=40))
            if res.fun < e:
                x, e = np.asarray(res.x, np.float64), float(res.fun)
                _, g = vg(x)
                if e < best["e"]:
                    best = {"e": e, "x": x.copy()}
                    np.savez(BEST + ".tmp.npz", t=x, energy=e)
                    os.replace(BEST + ".tmp.npz", BEST)
            gap = e - ed
            rec = {
                "outer": outer, "cleanup": True, "E": e,
                "gap_mHa": 1e3 * gap, "gnorm": float(np.linalg.norm(g)),
                "evals": n_eval[0],
                "elapsed_s": round(time.time() - t0, 1),
            }
            with open(LOG, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            print(f"[newton2] cleanup {outer:2d} | E {e:+.12f} | gap "
                  f"{rec['gap_mHa']:+.6f} mHa | gnorm {rec['gnorm']:.3e} | "
                  f"{rec['evals']} evals | {rec['elapsed_s']:.0f}s",
                  flush=True)
            if gap <= TARGET_HA:
                print(f"TARGET reached: gap {gap*1e6:.3f} uHa", flush=True)
                break

    xb, eb = best["x"], best["e"]
    # independent verification + checkpoint update (jax f64 path)
    import jax.numpy as jnp
    import optax

    step = vqe._build_step(tuple(vqe.selected_indices), optax.adam(1e-3))
    raw = step.raw_stages
    th = jnp.asarray(xb)
    psi = raw["fwd_from"](psi0_r, th)
    e_jax = float(raw["energy"](psi))
    sz, s2, fid = (float(np.asarray(v)) for v in raw["metrics"](psi))
    print(f"jax f64 check: E {e_jax:+.12f} (native-jax {abs(e_jax-eb):.2e}) "
          f"| fid {fid:.8f} | Sz {sz:+.2e} | gap {1e3*(e_jax-ed):+.6f} mHa",
          flush=True)
    prior = (float(np.asarray(vqe.results["epoch loss"][-1]))
             if vqe.results["epoch loss"] else np.inf)
    if e_jax < prior:
        vqe.params_t = th
        vqe.results["iteration loss"].append(e_jax)
        vqe.results["Sz"].append(sz)
        vqe.results["S^2"].append(s2)
        vqe.results["fidelity"].append(fid)
        vqe.results["epoch loss"].append(e_jax)
        vqe.save_model()
        print("checkpoint updated", flush=True)
        subprocess.run([sys.executable, os.path.join(HERE, "anchor_f64.py")])


if __name__ == "__main__":
    main()
