#!/usr/bin/env python
"""Per-process bisect of the basis_state program pieces on-chip.

tpu_bisect_fwd.py showed p1:basis failing after 139 s and every later
rung failing within 2-3 s -- consistent with in-process fail-fast after
the first backend error.  This script runs ONE rung per invocation
(argv[1]), so each attempt gets a clean client; drive it with a bash
loop.  Appends a JSON line per rung to tpu_bisect_basis.jsonl.
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
    salt = (time.time() % 86400) * 1e-9

    import jax
    import jax.numpy as jnp

    from qsfh_tpu.engine.state import basis_state, from_reim, to_reim

    occ = (0, 1, 2, 3, 4, 9, 10, 11, 12)

    def fn_iota2d():
        rows = (1 << N) // 128
        ri = jax.lax.iota(jnp.uint32, rows).reshape(rows, 1)
        ci = jax.lax.iota(jnp.uint32, 128).reshape(1, 128)
        hot = (ri == jnp.uint32(3)) & (ci == jnp.uint32(7))
        return hot.astype(jnp.float32).sum() + salt

    def fn_basis_real():
        psi = basis_state(N, occ, dtype=jnp.complex64)
        return jnp.real(psi).sum() + salt

    def fn_basis_reim():
        psi = basis_state(N, occ, dtype=jnp.complex64)
        return to_reim(psi) * (1.0 + salt)

    def fn_chain(pallas: str):
        os.environ["QSFH_PALLAS"] = pallas
        rng = np.random.default_rng(7)
        pr = jnp.asarray(
            rng.standard_normal((2, 1 << N)).astype(np.float32) * 1e-3
        )
        xs = jnp.asarray(rng.integers(0, 1 << N, 16).astype(np.uint32))
        zs = jnp.asarray(rng.integers(0, 1 << N, 16).astype(np.uint32))
        th = jnp.asarray(rng.standard_normal(16).astype(np.float32))

        def run(pr, th):
            from qsfh_tpu.engine.compiled import xor_flip_traced
            from qsfh_tpu.engine.pallas_kernels import pauli_chain_pallas
            from qsfh_tpu.engine.state import index_bits

            psi = from_reim(pr, jnp.complex64)
            if pallas == "1":
                psi = pauli_chain_pallas(
                    psi, N, xs, zs, th * (1 + salt),
                    jnp.ones(16, jnp.float32), jnp.zeros(16, jnp.float32),
                )
            else:
                idx = index_bits(N)

                def body(p, t):
                    xb, zb, a = t
                    par = jax.lax.population_count(idx & zb) & jnp.uint32(1)
                    s = (1.0 - 2.0 * par.astype(jnp.float32)).astype(p.dtype)
                    flip = xor_flip_traced(p, N, xb)
                    return (
                        jnp.cos(a) * p - 1j * jnp.sin(a) * s * flip,
                        None,
                    )

                psi, _ = jax.lax.scan(body, psi, (xs, zs, th * (1 + salt)))
            return to_reim(psi)

        return lambda: run(pr, th)

    def fn_chain_scan2():
        # force the scan-over-chunks path with a tiny program: 16 terms,
        # CHAIN_CHUNK monkeypatched to 8 -> lax.scan over 2 pallas calls
        from qsfh_tpu.engine import pallas_kernels as pk

        pk.CHAIN_CHUNK = 8
        return fn_chain("1")()

    def fn_chain_260():
        # realistic fwd-sized chain: 260 terms > CHAIN_CHUNK -> 2 chunks
        os.environ["QSFH_PALLAS"] = "1"
        rng = np.random.default_rng(9)
        import jax.numpy as jnp

        from qsfh_tpu.engine.pallas_kernels import pauli_chain_pallas
        from qsfh_tpu.engine.state import from_reim, to_reim

        pr = jnp.asarray(
            rng.standard_normal((2, 1 << N)).astype(np.float32) * 1e-3
        )
        T = 260
        xs = jnp.asarray(rng.integers(0, 1 << N, T).astype(np.uint32))
        zs = jnp.asarray(rng.integers(0, 1 << N, T).astype(np.uint32))
        th = jnp.asarray(rng.standard_normal(T).astype(np.float32))

        psi = from_reim(pr, jnp.complex64)
        psi = pauli_chain_pallas(
            psi, N, xs, zs, th * (1 + salt),
            jnp.ones(T, jnp.float32), jnp.zeros(T, jnp.float32),
        )
        return to_reim(psi)

    def _chain_n(T, glue):
        """T synthetic terms; glue in {none, concat, select}: reproduce
        run_segments' theta-derivation steps one at a time.  Salt is
        folded into the program (fresh hash per run)."""
        os.environ["QSFH_PALLAS"] = "1"
        rng = np.random.default_rng(9)
        import jax.numpy as jnp

        from qsfh_tpu.engine.pallas_kernels import pauli_chain_pallas
        from qsfh_tpu.engine.state import from_reim, to_reim

        pr = jnp.asarray(
            rng.standard_normal((2, 1 << N)).astype(np.float32) * 1e-3
        )
        xs = jnp.asarray(rng.integers(0, 1 << N, T).astype(np.uint32))
        zs = jnp.asarray(rng.integers(0, 1 << N, T).astype(np.uint32))
        pidx = rng.integers(0, 12, T)
        scales = jnp.asarray(rng.standard_normal(T).astype(np.float32))
        th12 = jnp.asarray(rng.standard_normal(12).astype(np.float32))

        def run():
            psi = from_reim(pr, jnp.complex64)
            if glue == "none":
                th = jnp.asarray(rng.standard_normal(T).astype(np.float32))
            else:
                ext = jnp.concatenate([th12, jnp.ones(1, th12.dtype)])
                if glue == "concat":
                    th = ext[:1] * jnp.ones(T, jnp.float32)
                else:  # select: the one-hot matmul run_segments uses
                    sel = np.zeros((T, 13), np.float32)
                    sel[np.arange(T), pidx] = 1.0
                    th = jnp.asarray(sel) @ ext
            psi = pauli_chain_pallas(
                psi, N, xs, zs, th * scales * (1 + salt),
                jnp.ones(T, jnp.float32), jnp.zeros(T, jnp.float32),
            )
            return to_reim(psi)

        return run

    fns = {
        "iota2d": fn_iota2d,
        "basis_real": fn_basis_real,
        "basis_reim": fn_basis_reim,
        "chain_pallas": fn_chain("1"),
        "chain_xla": fn_chain("0"),
        "chain_scan2": fn_chain_scan2,
        "chain_260": fn_chain_260,
        "chain_467": lambda: _chain_n(467, "none")(),
        "chain_467_concat": lambda: _chain_n(467, "concat")(),
        "chain_467_select": lambda: _chain_n(467, "select")(),
    }
    t0 = time.time()
    rec = {"rung": rung}
    try:
        out = jax.jit(fns[rung])()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        rec.update(ok=True, s=round(time.time() - t0, 1))
    except Exception as e:  # noqa: BLE001
        rec.update(ok=False, s=round(time.time() - t0, 1),
                   err=str(e).split("\n")[0][:120])
    with open(os.path.join(HERE, "tpu_bisect_basis.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return 0 if rec["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
