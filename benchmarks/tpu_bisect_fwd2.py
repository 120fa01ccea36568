#!/usr/bin/env python
"""Second fwd ladder, one rung per process (see tpu_bisect_basis.py):

  fwd_traced    the real raw fwd stage (basis_state traced inside)
  fwd_hostpsi   same circuit, but |psi0> fed as a host (2, 2^18) input
  step_hostpsi  one FULL train step (fwd+energy+cotangent+adjoint+
                metrics+update) with |psi0> as host input, single jit

tpu_bisect_basis showed basis->to_reim alone costs the compile service
119 s while a 16-term pallas chain costs 5 s: the traced basis one-hot
is the compile hog.  If fwd_hostpsi/step_hostpsi pass where fwd_traced
fails, the fused bench should feed the initial state from the host.
Appends to tpu_bisect_fwd2.jsonl.
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
    rung = sys.argv[1]
    salt = (time.time() % 86400) * 1e-9

    import jax
    import jax.numpy as jnp
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
    indices = tuple(range(N_ANSATZ))
    optimizer = optax.adam(1e-2)
    raw = vqe._build_step(indices, optimizer).raw_stages
    n = vqe.n_qubits
    th0 = jnp.full(N_ANSATZ, 0.05, dtype=vqe._rdt)
    opt0 = optimizer.init(th0)

    def host_psi0():
        index = 0
        from qsfh_tpu.engine.state import bitpos

        for q in vqe._occupied_modes:
            index |= 1 << bitpos(q, n)
        arr = np.zeros((2, 1 << n), np.float32)
        arr[0, index] = 1.0
        return jnp.asarray(arr)

    rec = {"rung": rung}
    t0 = time.time()
    try:
        if rung == "fwd_traced":
            out = jax.jit(raw["fwd"])(th0)
        elif rung == "fwd_hostpsi":
            out = jax.jit(raw["fwd_from"])(host_psi0(), th0)
        elif rung == "gather":
            # the pidx gather run_segments does per rot segment
            def g(th):
                ext = jnp.concatenate([th, jnp.ones(1, th.dtype)])
                idx = np.asarray([0, 3, 11, 12, 12, 7], np.int64)
                return ext[jnp.asarray(idx)].sum() * (1 + salt)
            out = jax.jit(g)(th0)
        elif rung == "chain_real":
            # pauli_chain_pallas DIRECTLY on the real merged-segment
            # arrays (T=467): isolates real mask/phase VALUES from the
            # run_segments glue
            from qsfh_tpu.engine.compiled import (
                CompiledCircuit,
                givens_network_static_ops,
            )
            from qsfh_tpu.engine.pallas_kernels import pauli_chain_pallas
            from qsfh_tpu.engine.state import from_reim, to_reim

            ops = [("rot", tuple(vqe.pool_rot[i]), slot)
                   for slot, i in enumerate(indices)]
            net_ops, gphase = givens_network_static_ops(
                n, vqe.problem.diagonal, vqe.problem.decomposition
            )
            cc = CompiledCircuit(ops + net_ops, n, global_phase=gphase)
            d = cc.segments[0].data
            T = len(d["xb"])
            thfull = np.full(T, 0.05, np.float32) * d["scale"].astype(
                np.float32
            ) * (1 + salt)

            def g(pr, tf):
                psi = from_reim(pr, vqe.dtype)
                psi = pauli_chain_pallas(
                    psi, n,
                    jnp.asarray(d["xb"]), jnp.asarray(d["zb"]), tf,
                    jnp.asarray(d["phre"], jnp.float32),
                    jnp.asarray(d["phim"], jnp.float32),
                )
                return to_reim(psi)
            out = jax.jit(g)(host_psi0(), jnp.asarray(thfull))
        elif rung in ("chain_real_nophase", "chain_synth_phase"):
            # A/B: real masks with trivial phases vs synthetic masks with
            # JW-like imaginary phases -- which input class does the
            # service reject?
            from qsfh_tpu.engine.compiled import (
                CompiledCircuit,
                givens_network_static_ops,
            )
            from qsfh_tpu.engine.pallas_kernels import pauli_chain_pallas
            from qsfh_tpu.engine.state import from_reim, to_reim

            rng = np.random.default_rng(77)
            T = 467
            if rung == "chain_real_nophase":
                ops = [("rot", tuple(vqe.pool_rot[i]), slot)
                       for slot, i in enumerate(indices)]
                net_ops, gphase = givens_network_static_ops(
                    n, vqe.problem.diagonal, vqe.problem.decomposition
                )
                cc = CompiledCircuit(ops + net_ops, n, global_phase=gphase)
                d = cc.segments[0].data
                xb, zb = d["xb"], d["zb"]
                T = len(xb)
                phre = np.ones(T, np.float32)
                phim = np.zeros(T, np.float32)
            else:
                xb = rng.integers(0, 1 << n, T).astype(np.uint32)
                zb = rng.integers(0, 1 << n, T).astype(np.uint32)
                # JW-like phases: most terms pure imaginary +-i
                sgn = rng.choice([-1.0, 1.0], T).astype(np.float32)
                phim = sgn
                phre = np.zeros(T, np.float32)
                phre[::6] = 1.0
                phim[::6] = 0.0
            thfull = (np.full(T, 0.05, np.float32) * (1 + salt)).astype(
                np.float32
            )

            def g(pr, tf):
                psi = from_reim(pr, vqe.dtype)
                psi = pauli_chain_pallas(
                    psi, n, jnp.asarray(xb), jnp.asarray(zb), tf,
                    jnp.asarray(phre), jnp.asarray(phim),
                )
                return to_reim(psi)
            out = jax.jit(g)(host_psi0(), jnp.asarray(thfull))
        elif rung == "rs_synth":
            # run_segments glue with a SYNTHETIC random single-segment
            # circuit of the same size/shape as the real merged fwd
            from qsfh_tpu.engine.compiled import CompiledCircuit
            from qsfh_tpu.engine.state import from_reim, to_reim

            rng = np.random.default_rng(123)
            T = 467
            ops = []
            for t in range(T):
                xb = int(rng.integers(0, 1 << n))
                zb = int(rng.integers(0, 1 << n))
                sc = float(rng.standard_normal() + salt)
                ops.append(("rot", ((xb, zb, sc),), int(t % 12)))
            cc = CompiledCircuit(ops, n)

            def g(pr, th):
                return to_reim(cc.apply(from_reim(pr, vqe.dtype), th))
            out = jax.jit(g)(host_psi0(), th0)
        elif rung in ("ans_only", "net_only"):
            from qsfh_tpu.engine.compiled import (
                CompiledCircuit,
                givens_network_static_ops,
            )
            from qsfh_tpu.engine.state import from_reim, to_reim

            if rung == "ans_only":
                ops = [("rot", tuple(vqe.pool_rot[i]), slot)
                       for slot, i in enumerate(indices)]
                cc = CompiledCircuit(ops, n)
            else:
                net_ops, gphase = givens_network_static_ops(
                    n, vqe.problem.diagonal, vqe.problem.decomposition
                )
                net_ops = net_ops + [("rot", ((0, 1, salt),), -1)]
                cc = CompiledCircuit(net_ops, n, global_phase=gphase)

            def g(pr, th):
                return to_reim(cc.apply(from_reim(pr, vqe.dtype), th))
            out = jax.jit(g)(host_psi0(), th0)
        elif rung == "step_hostpsi":
            def step(psi0_r, th, opt):
                psi_r = raw["fwd_from"](psi0_r, th)
                e = raw["energy"](psi_r)
                lam_r = raw["cotangent"](psi_r)
                g = raw["adjoint"](psi_r, lam_r, th)
                sz, s2, fid = raw["metrics"](psi_r)
                th, opt, gn = raw["update"](th, g, opt)
                return e, gn, th
            out = jax.jit(step)(host_psi0(), th0, opt0)
        else:
            raise KeyError(rung)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        rec.update(ok=True, s=round(time.time() - t0, 1))
    except Exception as e:  # noqa: BLE001
        rec.update(ok=False, s=round(time.time() - t0, 1),
                   err=str(e).split("\n")[0][:120])
    with open(os.path.join(HERE, "tpu_bisect_fwd2.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return 0 if rec["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
