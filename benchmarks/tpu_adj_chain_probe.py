#!/usr/bin/env python
"""Probe: does the remote compile helper accept the adjoint-CHAIN class?

2026-08-21 ~04:49Z the tunneled compile service STOPPED accepting the
18q adjoint-chain pallas program class: every compile returns HTTP 500
"tpu_compile_helper subprocess exit code 1" -- all chain lengths
(T=24..8192), fresh salts, healthy windows (probe 3.7 s; forward chain /
expectation chain / streaming classes still compile), with kernel source
byte-identical to the capture that compiled at 02:23Z the same morning
(tpu_adj18.json, rev d8c773c, first_call 135 s).  A service-side
regression of the same genus as the 30q fused-static worker fault.

This probe appends one record per invocation to tpu_adj_chain_probe.jsonl
so the regression (and any later recovery) is timestamped.  Run it in
healthy windows; if the class ever compiles again, flip production back
to the chain route (unset QSFH_PALLAS_ADJ_MAX_N) and re-measure the
flagship step (VERDICT r4 next #3).
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, "..")
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from qsfh_tpu.engine.pallas_kernels import adjoint_chain_pallas  # noqa: E402
from qsfh_tpu.engine.state import from_reim  # noqa: E402

OUT = os.path.join(HERE, "tpu_adj_chain_probe.jsonl")
N = 18
T = int(os.environ.get("QSFH_ADJPROBE_T", "24"))


def main():
    rng = np.random.default_rng(int(time.time()))
    salt = np.float32((time.time() % 997) * 1e-30)
    xb = rng.integers(1, 1 << N, T).astype(np.uint32)
    zb = rng.integers(0, 1 << N, T).astype(np.uint32)
    angle = rng.normal(0, 0.1, T).astype(np.float32) + salt
    one = np.ones(T, np.float32)
    zero = np.zeros(T, np.float32)
    psi_r = jnp.asarray(np.zeros((2, 1 << N), np.float32))

    def f(psi_r):
        psi = from_reim(psi_r, jnp.complex64)
        _, _, c = adjoint_chain_pallas(
            psi, psi, N, jnp.asarray(xb), jnp.asarray(zb), jnp.asarray(angle),
            jnp.asarray(one), jnp.asarray(one), jnp.asarray(zero),
        )
        return c.sum()

    rec = {
        "time": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n": N, "t_terms": T,
        "git": os.popen(f"git -C {ROOT} rev-parse --short HEAD").read().strip(),
    }
    t0 = time.time()
    try:
        v = jax.jit(f)(psi_r)
        np.asarray(v)
        rec.update(ok=True, seconds=round(time.time() - t0, 1))
        print(f"adjoint-chain class COMPILES again ({rec['seconds']}s) -- "
              "consider unsetting QSFH_PALLAS_ADJ_MAX_N in production")
    except Exception as e:
        rec.update(ok=False, seconds=round(time.time() - t0, 1),
                   error=f"{type(e).__name__}: {' '.join(str(e).split())[:200]}")
        print(f"adjoint-chain class still rejected ({rec['seconds']}s)")
    with open(OUT, "a") as fh:
        fh.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
