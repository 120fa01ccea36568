#!/usr/bin/env python
"""Clean re-probe of round-2 compile-service findings (one rung/process).

Several round-2 forensic conclusions were reached with rungs that
constructed the real model or called the old device-dispatching
real_dtype() — i.e. processes already poisoned by init-time fixed-hash
failures (see BASELINE.md "The on-chip train step").  This ladder re-runs
each claim in a provably dispatch-free process (init is now clean,
tests/test_no_eager_dispatch.py): the salted program below is the FIRST
dispatch of its process.

  gather       13-element constant-index gather  (claimed UNIMPLEMENTED)
  scatter      zeros.at[idx].add               (assumed UNIMPLEMENTED)
  basis        traced 18q basis one-hot -> to_reim (claimed ~120 s compile)
  scan_pallas  lax.scan over a 2-chunk pallas chain (claimed ~150 s compile)
  argmin SALT  every rung folds a time salt so hashes are always fresh.

Appends {rung, ok, s, err?} to tpu_reprobe.jsonl; `s` on success is the
compile+execute+fetch wall time (the cost claims being re-tested).
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

N = 18


def main() -> int:
    rung = sys.argv[1]
    salt = np.float32((time.time() % 86400) * 1e-9)

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    rec = {"rung": rung}
    t0 = time.time()
    try:
        if rung == "gather":
            vals = jnp.asarray(rng.standard_normal(13).astype(np.float32))
            idx = jnp.asarray(np.array([0, 3, 11, 12, 12, 7], np.int32))

            def g(v):
                return v[idx].sum() * (1 + salt)
            out = jax.jit(g)(vals)
        elif rung == "scatter":
            vals = jnp.asarray(rng.standard_normal(6).astype(np.float32))
            idx = jnp.asarray(np.array([0, 3, 11, 12, 12, 7], np.int32))

            def g(v):
                return jnp.zeros(13, jnp.float32).at[idx].add(v * (1 + salt))
            out = jax.jit(g)(vals)
        elif rung == "basis":
            from qsfh_tpu.engine.state import basis_state, to_reim

            def g():
                psi = basis_state(N, (0, 2, 5), dtype=jnp.complex64)
                return to_reim(psi * (1 + salt))
            out = jax.jit(g)()
        elif rung == "scan_pallas":
            from qsfh_tpu.engine import pallas_kernels as pk

            pk.CHAIN_CHUNK = 8
            os.environ["QSFH_PALLAS_UNROLL_CHUNKS"] = "0"  # force the scan
            from qsfh_tpu.engine.pallas_kernels import pauli_chain_pallas
            from qsfh_tpu.engine.state import from_reim, to_reim

            pr = jnp.asarray(
                rng.standard_normal((2, 1 << N)).astype(np.float32) * 1e-3
            )
            T = 16
            xs = jnp.asarray(rng.integers(0, 1 << N, T).astype(np.uint32))
            zs = jnp.asarray(rng.integers(0, 1 << N, T).astype(np.uint32))
            th = jnp.asarray(rng.standard_normal(T).astype(np.float32))

            def g(p, t):
                psi = from_reim(p, jnp.complex64)
                psi = pauli_chain_pallas(
                    psi, N, xs, zs, t * (1 + salt),
                    jnp.ones(T, jnp.float32), jnp.zeros(T, jnp.float32),
                )
                return to_reim(psi)
            out = jax.jit(g)(pr, th)
        else:
            raise KeyError(rung)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        rec.update(ok=True, s=round(time.time() - t0, 1))
    except Exception as e:  # noqa: BLE001
        rec.update(ok=False, s=round(time.time() - t0, 1),
                   err=str(e).split("\n")[0][:120])
    with open(os.path.join(HERE, "tpu_reprobe.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return 0 if rec.get("ok") else 1


if __name__ == "__main__":
    sys.exit(main())
