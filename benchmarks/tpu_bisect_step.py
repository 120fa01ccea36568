#!/usr/bin/env python
"""Bisect WHICH piece of the fused 18q ADAPT train step the compile
service rejects (UNIMPLEMENTED) in the current window.

Every fused attempt today dies at the first K=2 fetch while 20-qubit
streaming pallas programs compile and run in the same windows
(benchmarks/tpu_stream.json) -- so it's a program-shape class, not
health.  This script runs, each under its own fresh salt and its own
process-level jit, the ladder:

  stage:fwd / energy / cotangent / adjoint / metrics / update
  comp:fwd+energy ... comp:all (one_step, unscanned)
  scan2:all (lax.scan K=2)

logging time-to-fail per rung.  Results -> tpu_bisect_step.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

NX, NY = 3, 3
N_ANSATZ = 12


def main() -> int:
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    from qsfh_tpu.algos.adapt import ADAPT

    salt = float(os.environ.get("QSFH_BENCH_SALT", "0") or 0) or (
        (int(time.time()) % 86400) * 1e-9 + 1.3e-5
    )
    n_e = NX * NY
    vqe = ADAPT(
        n_epoch=0, threshold1=1e-2, threshold2=1e-2,
        x_dimension=NX, y_dimension=NY, n_electrons=n_e,
        n_spin_up=(n_e + 1) // 2, n_spin_down=n_e - (n_e + 1) // 2,
        tunneling=1.0, coulomb=6.0, ground_truth=False, plot=False,
        log_metrics=False, circuit_mode="split", program_salt=salt,
    )
    indices = tuple(range(N_ANSATZ))
    optimizer = optax.adam(1e-2)
    raw = vqe._build_step(indices, optimizer).raw_stages

    th0 = jnp.full(N_ANSATZ, 0.05, dtype=vqe._rdt)
    opt0 = optimizer.init(th0)

    t_start = time.time()
    results = {}

    def attempt(name, fn, *args):
        t0 = time.time()
        try:
            out = jax.jit(fn)(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf)  # fetch = proof of execution
            dt = time.time() - t0
            results[name] = {"ok": True, "s": round(dt, 1)}
            print(f"[bisect +{time.time()-t_start:6.1f}s] {name}: OK {dt:.1f}s",
                  file=sys.stderr, flush=True)
            return out
        except Exception as e:  # noqa: BLE001
            dt = time.time() - t0
            results[name] = {"ok": False, "s": round(dt, 1),
                             "err": str(e).split("\n")[0][:120]}
            print(f"[bisect +{time.time()-t_start:6.1f}s] {name}: FAIL {dt:.1f}s "
                  f"{results[name]['err']}", file=sys.stderr, flush=True)
            return None

    # --- individual stages ------------------------------------------------
    psi_r = attempt("stage:fwd", raw["fwd"], th0)
    if psi_r is None:
        # can't continue the ladder without a state; synthesize one host-side
        print("[bisect] fwd failed; stopping ladder", file=sys.stderr)
        json.dump(results, open(os.path.join(HERE, "tpu_bisect_step.json"), "w"),
                  indent=1)
        return 1
    attempt("stage:energy", raw["energy"], psi_r)
    lam_r = attempt("stage:cotangent", raw["cotangent"], psi_r)
    if lam_r is not None:
        attempt("stage:adjoint", raw["adjoint"], psi_r, lam_r, th0)
    attempt("stage:metrics", raw["metrics"], psi_r)
    g_fake = jnp.full(N_ANSATZ, 1e-3, dtype=vqe._rdt)
    attempt("stage:update", raw["update"], th0, g_fake, opt0)

    # --- cumulative compositions -----------------------------------------
    def comp_fe(th):
        p = raw["fwd"](th)
        return raw["energy"](p)

    def comp_fec(th):
        p = raw["fwd"](th)
        return raw["energy"](p), raw["cotangent"](p)

    def comp_feca(th):
        p = raw["fwd"](th)
        lam = raw["cotangent"](p)
        return raw["energy"](p), raw["adjoint"](p, lam, th)

    def comp_fecam(th):
        p = raw["fwd"](th)
        lam = raw["cotangent"](p)
        return raw["energy"](p), raw["adjoint"](p, lam, th), raw["metrics"](p)

    def one_step(carry, _):
        th, opt = carry
        p = raw["fwd"](th)
        e = raw["energy"](p)
        lam = raw["cotangent"](p)
        g = raw["adjoint"](p, lam, th)
        sz, s2, fid = raw["metrics"](p)
        th, opt, gn = raw["update"](th, g, opt)
        return (th, opt), (e, sz, s2, fid, gn)

    def comp_all(th, opt):
        (th, opt), out = one_step((th, opt), None)
        return out

    def scan2(th, opt):
        (th, opt), traj = lax.scan(one_step, (th, opt), None, length=2)
        return traj

    attempt("comp:fwd+energy", comp_fe, th0)
    attempt("comp:+cotangent", comp_fec, th0)
    attempt("comp:+adjoint", comp_feca, th0)
    attempt("comp:+metrics", comp_fecam, th0)
    attempt("comp:all", comp_all, th0, opt0)
    attempt("scan2:all", scan2, th0, opt0)

    json.dump(results, open(os.path.join(HERE, "tpu_bisect_step.json"), "w"),
              indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
