#!/usr/bin/env python
"""Arg-vs-const bisect ladder (one rung per process, see tpu_bisect_basis.py).

Observation driving this ladder: EVERY passing rung so far was a
zero-argument jitted program (all inputs baked as constants —
tpu_bisect_basis.py's harness jits thunks), while EVERY failing rung
passed runtime arguments (tpu_bisect_fwd2.py's rungs).  The glue
hypotheses (theta select/concat, scale multiply) were individually
cleared by chain_467_select / chain_467_concat.  This ladder isolates
the argument axis with minimal pairs:

  ctl             chain_467 synthetic, zero-arg           (expect PASS)
  arg_th          same program, theta (12,) runtime arg
  arg_pr          same program, |psi> (2,2^18) runtime arg
  arg_both        both runtime args
  real_const      REAL merged fwd segment, zero-arg (masks/psi0/theta const)
  rs_const        CompiledCircuit.apply glue (run_segments), zero-arg
  step_const      FULL fused train step, K=2 unrolled, ZERO-ARG
                  (optimization_barrier blocks constant folding)
  step_const_nobar  same without the barrier (in case the barrier op
                  itself is what the service rejects)

If step_const passes, benchmarks/tpu_step_fused.py gains a zero-arg
mode and the on-chip train-step artifact is within reach.
Appends to tpu_bisect_args.jsonl.
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
N = 2 * NX * NY
N_ANSATZ = 12


def main() -> int:
    rung = sys.argv[1]
    salt = (time.time() % 86400) * 1e-9
    os.environ.setdefault("QSFH_PALLAS", "1")

    import jax

    lower_only = bool(os.environ.get("QSFH_BISECT_LOWER_ONLY"))
    if lower_only:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    def jrun(f, *args):
        if lower_only:
            jax.jit(f).lower(*args)
            return jnp.zeros(())
        return jax.jit(f)(*args)

    rng = np.random.default_rng(9)

    def synth_chain_inputs():
        T = 467
        pr = jnp.asarray(rng.standard_normal((2, 1 << N)).astype(np.float32) * 1e-3)
        xs = jnp.asarray(rng.integers(0, 1 << N, T).astype(np.uint32))
        zs = jnp.asarray(rng.integers(0, 1 << N, T).astype(np.uint32))
        th = jnp.asarray(rng.standard_normal(T).astype(np.float32))
        return pr, xs, zs, th

    def chain_body(pr, xs, zs, th):
        from qsfh_tpu.engine.pallas_kernels import pauli_chain_pallas
        from qsfh_tpu.engine.state import from_reim, to_reim

        T = th.shape[0]
        psi = from_reim(pr, jnp.complex64)
        psi = pauli_chain_pallas(
            psi, N, xs, zs, th * (1 + salt),
            jnp.ones(T, jnp.float32), jnp.zeros(T, jnp.float32),
        )
        return to_reim(psi)

    def build_vqe():
        from qsfh_tpu.algos.adapt import ADAPT

        n_e = NX * NY
        return ADAPT(
            n_epoch=0, threshold1=1e-2, threshold2=1e-2,
            x_dimension=NX, y_dimension=NY, n_electrons=n_e,
            n_spin_up=(n_e + 1) // 2, n_spin_down=n_e - (n_e + 1) // 2,
            tunneling=1.0, coulomb=6.0, ground_truth=False, plot=False,
            log_metrics=False, circuit_mode="split", program_salt=salt,
        )

    def host_psi0(vqe):
        from qsfh_tpu.engine.state import bitpos

        index = 0
        for q in vqe._occupied_modes:
            index |= 1 << bitpos(q, vqe.n_qubits)
        arr = np.zeros((2, 1 << vqe.n_qubits), np.float32)
        arr[0, index] = 1.0
        return arr

    def real_segment(vqe):
        from qsfh_tpu.engine.compiled import (
            CompiledCircuit,
            givens_network_static_ops,
        )

        indices = tuple(range(N_ANSATZ))
        ops = [("rot", tuple(vqe.pool_rot[i]), slot)
               for slot, i in enumerate(indices)]
        net_ops, gphase = givens_network_static_ops(
            N, vqe.problem.diagonal, vqe.problem.decomposition
        )
        cc = CompiledCircuit(ops + net_ops, N, global_phase=gphase)
        return cc

    rec = {"rung": rung}
    t0 = time.time()
    try:
        if rung == "ctl":
            pr, xs, zs, th = synth_chain_inputs()
            out = jrun(lambda: chain_body(pr, xs, zs, th))
        elif rung == "arg_th":
            pr, xs, zs, th = synth_chain_inputs()
            out = jrun(lambda t: chain_body(pr, xs, zs, t), th)
        elif rung == "arg_pr":
            pr, xs, zs, th = synth_chain_inputs()
            out = jrun(lambda p: chain_body(p, xs, zs, th), pr)
        elif rung == "arg_both":
            pr, xs, zs, th = synth_chain_inputs()
            out = jrun(lambda p, t: chain_body(p, xs, zs, t), pr, th)
        elif rung == "real_const":
            vqe = build_vqe()
            cc = real_segment(vqe)
            d = cc.segments[0].data
            T = len(d["xb"])
            pr = jnp.asarray(host_psi0(vqe))
            xs = jnp.asarray(d["xb"])
            zs = jnp.asarray(d["zb"])
            thfull = jnp.asarray(
                np.full(T, 0.05, np.float32)
                * d["scale"].astype(np.float32) * (1 + salt)
            )

            from qsfh_tpu.engine.pallas_kernels import pauli_chain_pallas
            from qsfh_tpu.engine.state import from_reim, to_reim

            phre = jnp.asarray(d["phre"], jnp.float32)
            phim = jnp.asarray(d["phim"], jnp.float32)

            def g():
                psi = from_reim(pr, vqe.dtype)
                psi = pauli_chain_pallas(psi, N, xs, zs, thfull, phre, phim)
                return to_reim(psi)
            out = jrun(g)
        elif rung == "rs_const":
            vqe = build_vqe()
            cc = real_segment(vqe)
            pr = jnp.asarray(host_psi0(vqe))
            th0 = jnp.full(N_ANSATZ, 0.05 * (1 + salt), jnp.float32)

            from qsfh_tpu.engine.state import from_reim, to_reim

            def g():
                return to_reim(cc.apply(from_reim(pr, vqe.dtype), th0))
            out = jrun(g)
        elif rung in ("step_const", "step_const_nobar"):
            import optax

            vqe = build_vqe()
            indices = tuple(range(N_ANSATZ))
            optimizer = optax.adam(1e-2)
            raw = vqe._build_step(indices, optimizer).raw_stages
            th0 = jnp.full(N_ANSATZ, 0.05, dtype=vqe._rdt)
            opt0 = optimizer.init(th0)
            pr0 = jnp.asarray(host_psi0(vqe))

            def g():
                if rung == "step_const":
                    pr, th, opt = jax.lax.optimization_barrier(
                        (pr0, th0, opt0)
                    )
                else:
                    pr, th, opt = pr0, th0, opt0
                es = []
                for _ in range(2):
                    psi_r = raw["fwd_from"](pr, th)
                    e = raw["energy"](psi_r)
                    lam_r = raw["cotangent"](psi_r)
                    gr = raw["adjoint"](psi_r, lam_r, th)
                    th, opt, gn = raw["update"](th, gr, opt)
                    es.append(e)
                return jnp.stack(es), gn
            out = jrun(g)
        else:
            raise KeyError(rung)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        rec.update(ok=True, s=round(time.time() - t0, 1))
    except Exception as e:  # noqa: BLE001
        rec.update(ok=False, s=round(time.time() - t0, 1),
                   err=str(e).split("\n")[0][:120])
    with open(os.path.join(HERE, "tpu_bisect_args.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return 0 if rec["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
