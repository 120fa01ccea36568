#!/usr/bin/env python
"""On-chip validation of the double-float expectation path (VERDICT #4).

Feeds a random normalized f32 state as (2, 2^n) REAL input planes (the
axon backend's complex-free ABI), evaluates the 18q Hubbard energy
three ways -- plain f32 engine path, double-float (engine/dfloat.py),
host float64 referee over the IDENTICAL f32 state -- and records
accuracy + marginal overhead.

The claim being validated: the df REDUCTION of an f32 state matches
its float64 evaluation to <= 1e-9 relative (the reference's c128
capability, /root/reference/models/hva.py:145), while the plain f32
reduction carries the ~1e-6-class noise floor that blocked trusting
on-chip convergence below ~1e-5 (VERDICT round-2 missing #2).
"""
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

NX = int(os.environ.get("QSFH_DF_NX", "3"))
NY = int(os.environ.get("QSFH_DF_NY", "3"))
K = int(os.environ.get("QSFH_DF_CHAIN", "8"))  # evals per chain for marginals


def main() -> int:
    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS") == "cpu" or "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    on_cpu = jax.devices()[0].platform == "cpu"
    if on_cpu and not os.environ.get("QSFH_PROFILE_ALLOW_CPU"):
        print("tpu_df_check: no TPU; refusing to record", file=sys.stderr)
        return 1

    from qsfh_tpu.engine.dfloat import combine_df, expectation_df
    from qsfh_tpu.engine import expectation as ex
    from qsfh_tpu.engine.state import qmask_to_bmask
    from qsfh_tpu.ops.jw import jordan_wigner
    from qsfh_tpu.ops.lattice import fermi_hubbard

    N = 2 * NX * NY
    H = jordan_wigner(fermi_hubbard(NX, NY, 1.0, 6.0, periodic=True))
    obs = ex.Observable(H, N)
    salt = float(os.environ.get("QSFH_BENCH_SALT", "0") or 0)

    rng = np.random.default_rng(4242)
    psi = rng.standard_normal(1 << N) + 1j * rng.standard_normal(1 << N)
    psi /= np.linalg.norm(psi)
    re32 = psi.real.astype(np.float32)
    im32 = psi.imag.astype(np.float32)
    planes = jnp.asarray(np.stack([re32, im32]))  # (2, 2^n) f32 input

    @jax.jit
    def eval_plain(pl):
        psi_c = (pl[0] + 1j * pl[1]).astype(jnp.complex64) + salt * 1e-30
        return obs.expectation_scan(psi_c)

    @jax.jit
    def eval_df(pl):
        return expectation_df(pl + salt * 1e-35, N, H)

    @jax.jit
    def chain_plain(pl):
        tot = jnp.zeros((), jnp.float32)
        for k in range(K):
            # k-dependent denormal nudge: keeps XLA from CSE-ing the K
            # evals into one while being far below the f32 noise floor
            psi_c = (pl[0] + 1j * pl[1]).astype(jnp.complex64) + k * 1e-35
            tot = tot + ex.expectation(psi_c, N, H, obs.groups)
        return tot

    @jax.jit
    def chain_df(pl):
        hi = jnp.zeros((), jnp.float32)
        lo = jnp.zeros((), jnp.float32)
        for k in range(K):
            v = expectation_df(pl + k * 1e-35, N, H)
            hi, lo = hi + v[0], lo + v[1]
        return jnp.stack([hi, lo])

    t0 = time.time()
    log = lambda m: print(f"[df +{time.time()-t0:6.1f}s] {m}", file=sys.stderr, flush=True)

    e_plain = float(eval_plain(planes))
    log(f"plain f32 fetched: {e_plain}")
    e_df = combine_df(np.asarray(eval_df(planes), np.float64))
    log(f"df fetched: {e_df}")

    # host float64 referee over the SAME f32 state
    psi64 = re32.astype(np.float64) + 1j * im32.astype(np.float64)
    b = np.arange(1 << N, dtype=np.uint64)
    e_ref = 0.0
    for x, z, c in zip(H.x, H.z, H.c):
        xb = np.uint64(qmask_to_bmask(int(x), N))
        zb = np.uint64(qmask_to_bmask(int(z), N))
        sign = 1.0 - 2.0 * (np.bitwise_count(b & zb).astype(np.int64) % 2)
        c_adj = complex(c) * ((-1.0) ** bin(int(z) & int(x)).count("1"))
        e_ref += np.real(np.vdot(psi64, c_adj * sign * psi64[b ^ xb]))
    log(f"host f64 referee: {e_ref}")

    rel_plain = abs(e_plain - e_ref) / max(abs(e_ref), 1e-12)
    rel_df = abs(e_df - e_ref) / max(abs(e_ref), 1e-12)
    log(f"rel err: plain {rel_plain:.2e}, df {rel_df:.2e}")

    def timed(fn):
        s = time.time()
        np.asarray(fn(planes))
        return time.time() - s

    for fn, name in ((chain_plain, "plain"), (chain_df, "df")):
        log(f"chain {name} first call {timed(fn):.1f}s (includes compile)")
    tp = min(timed(chain_plain) for _ in range(3))
    td = min(timed(chain_df) for _ in range(3))

    out = {
        "platform": str(jax.devices()[0]),
        "n_qubits": N,
        "h_terms": len(H.x),
        "energy_plain_f32": e_plain,
        "energy_df": e_df,
        "energy_f64_referee": float(e_ref),
        "rel_err_plain": float(rel_plain),
        "rel_err_df": float(rel_df),
        "df_beats_plain_by": float(rel_plain / max(rel_df, 1e-18)),
        "chain_plain_s": tp,
        "chain_df_s": td,
        "df_overhead_x": round(td / max(tp, 1e-9), 2),
        "k_chain": K,
        "pass": bool(rel_df <= 1e-9),
        "recorded_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    dest = os.path.join(HERE, "tpu_df_check.json" if not on_cpu else "df_check_cpu.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print("tpu_df_check:", json.dumps(out))
    return 0 if out["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
