#!/usr/bin/env python
"""Bisect the 18q ADAPT fwd stage on-chip (tpu_bisect_step.py showed
stage:fwd is the piece the compile service rejects, after 722 s).

Rungs (each its own fresh-salted jit + fetch):
  basis       basis_state alone
  ansatz      pallas/XLA chain over the 12-op ansatz segment
  network     chain over the Givens network segment
  ans+net     the two chained (= the two_scan fwd)
  fwd         the actual raw fwd stage (merged single segment)
Run twice: QSFH_PALLAS=1 (chain kernels) and =0 (XLA scan lowering).
Writes tpu_bisect_fwd.json.
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


def build(salt):
    import optax

    from qsfh_tpu.algos.adapt import ADAPT

    n_e = NX * NY
    vqe = ADAPT(
        n_epoch=0, threshold1=1e-2, threshold2=1e-2,
        x_dimension=NX, y_dimension=NY, n_electrons=n_e,
        n_spin_up=(n_e + 1) // 2, n_spin_down=n_e - (n_e + 1) // 2,
        tunneling=1.0, coulomb=6.0, ground_truth=False, plot=False,
        log_metrics=False, circuit_mode="split", program_salt=salt,
    )
    return vqe


def main() -> int:
    import jax
    import jax.numpy as jnp

    from qsfh_tpu.engine.compiled import (
        CompiledCircuit,
        givens_network_static_ops,
    )
    from qsfh_tpu.engine.state import basis_state, to_reim

    base_salt = (int(time.time()) % 86400) * 1e-9
    t_start = time.time()
    results = {}

    def attempt(name, fn, *args):
        t0 = time.time()
        try:
            out = jax.jit(fn)(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            dt = time.time() - t0
            results[name] = {"ok": True, "s": round(dt, 1)}
            print(f"[fwd-bisect +{time.time()-t_start:6.1f}s] {name}: OK {dt:.1f}s",
                  file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            dt = time.time() - t0
            results[name] = {"ok": False, "s": round(dt, 1),
                             "err": str(e).split("\n")[0][:120]}
            print(f"[fwd-bisect +{time.time()-t_start:6.1f}s] {name}: FAIL {dt:.1f}s",
                  file=sys.stderr, flush=True)
        json.dump(results, open(os.path.join(HERE, "tpu_bisect_fwd.json"), "w"),
                  indent=1)

    for pallas in ("1", "0"):
        os.environ["QSFH_PALLAS"] = pallas
        tag = f"p{pallas}"
        salt = base_salt + (0.31e-6 if pallas == "1" else 0.57e-6)
        vqe = build(salt)
        p = vqe.problem
        n = vqe.n_qubits
        dt_ = vqe.dtype
        indices = tuple(range(N_ANSATZ))
        ops = [("rot", tuple(vqe.pool_rot[i]), slot)
               for slot, i in enumerate(indices)]
        net_ops, gphase = givens_network_static_ops(
            n, p.diagonal, p.decomposition
        )
        net_ops = net_ops + [("rot", ((0, 1, salt),), -1)]
        ans_cc = CompiledCircuit(ops, n)
        net_cc = CompiledCircuit(net_ops, n, global_phase=gphase)
        th0 = jnp.full(N_ANSATZ, 0.05, dtype=vqe._rdt)

        occ = vqe._occupied_modes

        attempt(f"{tag}:basis",
                lambda: to_reim(basis_state(n, occ, dtype=dt_) * (1 + salt)))
        attempt(f"{tag}:ansatz",
                lambda th: to_reim(ans_cc.apply(
                    basis_state(n, occ, dtype=dt_) * (1 + salt), th)), th0)
        attempt(f"{tag}:network",
                lambda th: to_reim(net_cc.apply(
                    basis_state(n, occ, dtype=dt_), th)), th0)
        attempt(f"{tag}:ans+net",
                lambda th: to_reim(net_cc.apply(ans_cc.apply(
                    basis_state(n, occ, dtype=dt_), th), th)), th0)

        raw = vqe._build_step(indices, __import__("optax").adam(1e-2)).raw_stages
        attempt(f"{tag}:fwd", raw["fwd"], th0)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
