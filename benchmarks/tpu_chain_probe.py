#!/usr/bin/env python
"""On-chip probe: per-rotation cost of the flagship fwd path at 18q,
flagship-scale op chains, permute V1 vs V2 A/B.

Motivation: the flagship 3x3 growth run (1017 ops ~ 8k Pauli rotations)
spends ~5 s of device time per train iteration; the dynamic-permute MXU
model says the chain kernels should cost ~9 us/rotation.  This probe
builds the EXACT fwd program shape (`CompiledCircuit` over extended-pool
ops, same lowering `qsfh_tpu/algos/adapt.py:355`), times it MARGINALLY
between two op counts (which cancels dispatch/RTT constants), and
repeats with QSFH_PERMUTE_V2=1.  Writes benchmarks/tpu_chain_probe.json.

Run chip-exclusive (pause the growth job) or the numbers are queue time.
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

import numpy as np

OUT = os.path.join(HERE, "tpu_chain_probe.json")
N = 18
OPS1 = int(os.environ.get("QSFH_PROBE_OPS1", "128"))
OPS2 = int(os.environ.get("QSFH_PROBE_OPS2", "384"))
REPS = 5


def log(msg, _t0=[None]):
    now = time.time()
    if _t0[0] is None:
        _t0[0] = now
    print(f"[chain_probe +{now - _t0[0]:6.1f}s] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    if dev.platform == "cpu" and not os.environ.get("QSFH_PROFILE_ALLOW_CPU"):
        print("refusing to record CPU numbers"); return 1
    cache = os.path.join(ROOT, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from qsfh_tpu.engine.compiled import CompiledCircuit
    from qsfh_tpu.engine.state import from_reim, to_reim
    from qsfh_tpu.ops.jw import jordan_wigner
    from qsfh_tpu.ops.pool import hubbard_interaction_pool_extended

    out = {"platform": str(dev), "n_qubits": N, "ops1": OPS1, "ops2": OPS2}
    salt = float(os.environ.get("QSFH_BENCH_SALT", "0") or 0)

    pool = hubbard_interaction_pool_extended(3, 3)
    rng = np.random.default_rng(7)
    idx = rng.integers(0, len(pool), OPS2)
    pool_rot = [jordan_wigner(pool[int(i)]).rotation_terms() for i in idx]
    n_rots = [sum(len(pool_rot[i]) for i in range(k)) for k in (OPS1, OPS2)]
    out["rotations_at_ops"] = {str(OPS1): n_rots[0], str(OPS2): n_rots[1]}
    log(f"ops {OPS1}/{OPS2} -> rotations {n_rots[0]}/{n_rots[1]}")

    psi0 = (rng.normal(0, 1, 2 ** N) + 1j * rng.normal(0, 1, 2 ** N))
    psi0 = (psi0 / np.linalg.norm(psi0)).astype(np.complex64)
    psi0_r = jnp.asarray(np.stack([psi0.real, psi0.imag]))
    th_full = rng.normal(0, 0.05, OPS2).astype(np.float32) * (1.0 + salt)

    def build_fwd(k):
        ops = [("rot", tuple(pool_rot[i]), slot) for slot, i in
               enumerate(range(k))]
        cc = CompiledCircuit(ops, N)
        # salt as a PROGRAM CONSTANT: value-only salts don't change the
        # program hash, and the remote service caches failures by hash
        scale = 1.0 + salt

        def fwd(psi_r, th):
            return to_reim(cc.apply(from_reim(psi_r, jnp.complex64), th)
                           * scale)

        return jax.jit(fwd)

    results = {}
    ref_states = {}
    for v2 in ("0", "1"):
        os.environ["QSFH_PERMUTE_V2"] = v2
        label = f"v{int(v2) + 1}"
        try:
            fns = {}
            for k in (OPS1, OPS2):
                fns[k] = build_fwd(k)
                t_first = time.time()
                r = np.asarray(fns[k](psi0_r, jnp.asarray(th_full[:k])))
                log(f"{label}: ops={k} first call "
                    f"{time.time() - t_first:.1f}s")
                ref_states[(label, k)] = r
            ts = {}
            for k in (OPS1, OPS2):
                th = jnp.asarray(th_full[:k])
                samples = []
                for _ in range(REPS):
                    s0 = time.time()
                    np.asarray(fns[k](psi0_r, th))
                    samples.append(time.time() - s0)
                ts[k] = float(np.median(samples))
            us = 1e6 * (ts[OPS2] - ts[OPS1]) / (n_rots[1] - n_rots[0])
            results[label] = {
                "t_ops1_s": ts[OPS1], "t_ops2_s": ts[OPS2],
                "us_per_rotation_marginal": round(us, 2),
            }
            log(f"{label}: {us:.1f} us/rotation "
                f"(t({OPS1})={ts[OPS1]:.3f}s t({OPS2})={ts[OPS2]:.3f}s)")
        except Exception as exc:
            results[label] = {"error": f"{type(exc).__name__}: {str(exc)[:200]}"}
            log(f"{label} FAILED: {type(exc).__name__}: {str(exc)[:150]}")
        finally:
            os.environ["QSFH_PERMUTE_V2"] = "0"
    if ("v1", OPS2) in ref_states and ("v2", OPS2) in ref_states:
        a, b = ref_states[("v1", OPS2)], ref_states[("v2", OPS2)]
        rel = float(np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-30))
        results["v2_vs_v1_rel_err"] = rel
        log(f"v2 vs v1 state rel err: {rel:.2e}")
    out["fwd"] = results
    out["recorded_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
