#!/usr/bin/env python
"""On-chip batched multistart HVA: B starts x K epochs as ONE fused program.

Measures the claim qsfh_tpu/algos/multistart.py makes: batching B
independent VQE replicas over a leading vmap axis multiplies training
throughput, because a single 2^n statevector at small n underfeeds the
VPU lanes.  Protocol matches benchmarks/fused_harness.py (the module is
not reused directly because this measurement times TWO batch sizes and
reports their ratio): every (B, K) program variant is warmed before any
timing, the energy trajectories are parity-checked against a CPU-generated
expected trace (config-stamped, regenerate with
``JAX_PLATFORMS=cpu QSFH_PROFILE_ALLOW_CPU=1 python benchmarks/tpu_multistart.py``),
and timing is the MARGINAL between two scan lengths (cancels tunnel RTT).

Reference contrast: the reference trains one parameter vector per process
(``/root/reference/models/hva.py:305-355``); a B-start study costs B full
runs.  Writes benchmarks/tpu_multistart.json.
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

NX = int(os.environ.get("QSFH_MS_NX", "2"))
NY = int(os.environ.get("QSFH_MS_NY", "3"))
REPS = int(os.environ.get("QSFH_MS_REPS", "4"))
B = int(os.environ.get("QSFH_MS_STARTS", "32"))
K1 = int(os.environ.get("QSFH_MS_K1", "2"))
K2 = int(os.environ.get("QSFH_MS_K2", "8"))
SEED = 7
EXPECTED_PATH = os.path.join(HERE, "multistart_expected.json")
RESULT_PATH = os.path.join(HERE, "tpu_multistart.json")
SALT = float(os.environ.get("QSFH_BENCH_SALT", "0") or 0)
CONFIG = {"nx": NX, "ny": NY, "reps": REPS, "b": B, "k1": K1, "k2": K2,
          "seed": SEED}


def build():
    import jax
    import jax.numpy as jnp
    import optax

    from qsfh_tpu.algos.multistart import MultistartHVA

    ms = MultistartHVA(
        n_starts=B, n_epoch=0, reps=REPS, lr=3e-2,
        x_dimension=NX, y_dimension=NY,
        n_electrons=NX * NY,
        n_spin_up=(NX * NY + 1) // 2,
        n_spin_down=NX * NY - (NX * NY + 1) // 2,
        tunneling=1.0, coulomb=6.0,
        init_scale=0.1, seed=SEED, ground_truth=False,
        results_root="/tmp/qsfh_ms_bench_results",
    )
    vg = jax.vmap(jax.value_and_grad(ms.loss))
    vnorm = jax.vmap(lambda g: jnp.sqrt(
        sum(jnp.sum(v * v) for v in jax.tree_util.tree_leaves(g))
    ))
    batch_full = {k: jnp.asarray(np.asarray(v)) for k, v in ms.batch_params.items()}

    def make(k, b):
        opt = optax.adam(3e-2)
        jb = {kk: vv[:b] for kk, vv in batch_full.items()}

        def prog():
            params = jax.lax.optimization_barrier(jb)
            state = opt.init(params)

            def body(carry, _):
                p, s = carry
                vals, grads = vg(p)
                gns = vnorm(grads)
                upd, s = opt.update(grads, s, p)
                p = optax.apply_updates(p, upd)
                # numerically invisible salt keeps retry hashes fresh
                return (p, s), (vals, gns + SALT * 1e-30)

            (_, _), traj = jax.lax.scan(body, (params, state), None, length=k)
            return traj

        return jax.jit(prog)

    return {(k, b): make(k, b) for k in (K1, K2) for b in (1, B)}


def run_chain(progs, k, b):
    t0 = time.time()
    vals, gns = progs[(k, b)]()
    energies = np.asarray(vals)  # host fetch proves the chain executed
    return time.time() - t0, energies, np.asarray(gns)


def main() -> int:
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu" or "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    platform = jax.devices()[0].platform
    on_cpu = platform == "cpu"
    if on_cpu and not os.environ.get("QSFH_PROFILE_ALLOW_CPU"):
        print("tpu_multistart: no TPU platform; refusing to record",
              file=sys.stderr)
        return 1

    t0 = time.time()
    progs = build()
    print(f"[ms +{time.time()-t0:6.1f}s] built", file=sys.stderr, flush=True)

    # warm every variant (first call includes the remote compile)
    for key in ((K1, 1), (K2, 1), (K1, B), (K2, B)):
        dt, e, _ = run_chain(progs, *key)
        print(f"[ms +{time.time()-t0:6.1f}s] (k={key[0]}, b={key[1]}) "
              f"first call {dt:.1f}s E[0,0]={e[0].ravel()[0]:.6f}",
              file=sys.stderr, flush=True)

    _, energies, gnorms = run_chain(progs, K2, B)
    if on_cpu:
        with open(EXPECTED_PATH, "w") as f:
            json.dump({"config": CONFIG, "energies": energies.tolist(),
                       "gnorms": gnorms.tolist()}, f)
        print("wrote expected trace (CPU)", file=sys.stderr)
    else:
        if not os.path.exists(EXPECTED_PATH):
            print("tpu_multistart: no expected trace; generate on CPU first",
                  file=sys.stderr)
            return 1
        exp = json.load(open(EXPECTED_PATH))
        if exp.get("config") != CONFIG:
            print(f"tpu_multistart: trace config mismatch "
                  f"({exp.get('config')} vs {CONFIG}); regenerate on CPU",
                  file=sys.stderr)
            return 1
        ref_e = np.asarray(exp["energies"])
        ref_g = np.asarray(exp["gnorms"])
        if ref_e.shape != energies.shape:
            print("tpu_multistart: trace shape mismatch", file=sys.stderr)
            return 1
        # Parity gates on the first two epochs only: epoch 0 is a pure
        # function of the (identical) inits and epoch 1 is one Adam step
        # away, so both are deterministic to f32 rounding.  Later epochs
        # of this deliberately swinging lr=3e-2 trajectory amplify
        # CPU-vs-TPU ulp differences Lyapunov-style (observed 1.5e-2 by
        # epoch 8 with epoch 0 exact); that drift is chaos, not an engine
        # defect, so it is reported but not gated.
        err01 = float(np.max(np.abs(energies[:2] - ref_e[:2])
                             / np.maximum(np.abs(ref_e[:2]), 1e-9)))
        err = float(np.max(np.abs(energies - ref_e)
                           / np.maximum(np.abs(ref_e), 1e-9)))
        gerr = float(np.max(np.abs(gnorms - ref_g)
                            / np.maximum(np.abs(ref_g), 1e-9)))
        print(f"[ms] rel err vs CPU trace: epochs0-1 {err01:.2e} "
              f"full-trajectory {err:.2e} gnorm {gerr:.2e}",
              file=sys.stderr, flush=True)
        if err01 > 1e-3:
            print("tpu_multistart: PARITY FAIL; not recording", file=sys.stderr)
            return 1

    # marginal per-epoch time at each batch size (median of 3)
    per_epoch = {}
    for b in (1, B):
        ts = {k: float(np.median([run_chain(progs, k, b)[0] for _ in range(3)]))
              for k in (K1, K2)}
        m = (ts[K2] - ts[K1]) / (K2 - K1)
        if m <= 0:
            m = ts[K2] / K2  # RTT jitter swamped the chain: honest upper bound
            print(f"[ms] b={b}: marginal invalid; upper bound used",
                  file=sys.stderr)
        per_epoch[b] = m
        print(f"[ms] b={b}: t({K2})={ts[K2]:.3f}s t({K1})={ts[K1]:.3f}s "
              f"-> {m*1e3:.2f} ms/epoch", file=sys.stderr, flush=True)

    speedup = per_epoch[1] * B / per_epoch[B]
    blob = {
        "metric": f"multistart_hva_{2*NX*NY}q_start_epochs_per_sec",
        "value": round(B / per_epoch[B], 2),
        "unit": "start-epochs/sec",
        "vs_baseline": None,
        "single_start_epochs_per_sec": round(1.0 / per_epoch[1], 2),
        "batch_size": B,
        "batching_speedup": round(speedup, 2),
        "how": (f"one jitted lax.scan: {B} HVA starts x K epochs "
                f"(vmap value_and_grad + Adam), marginal between scan "
                f"lengths {K1}/{K2}, epochs 0-1 parity-checked vs CPU "
                f"trace; batching_speedup = B*t_epoch(1)/t_epoch(B)"),
        "parity_rel_err_epochs01": None if on_cpu else err01,
        "chaotic_drift_rel_err_full_traj": None if on_cpu else err,
        "platform": str(jax.devices()[0]),
    }
    dest = RESULT_PATH if not on_cpu else os.path.join(
        "/tmp", os.path.basename(RESULT_PATH))
    with open(dest, "w") as f:
        json.dump(blob, f)
    print("tpu_multistart:", json.dumps(blob))
    return 0


if __name__ == "__main__":
    sys.exit(main())
