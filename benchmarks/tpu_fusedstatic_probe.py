#!/usr/bin/env python
"""26q fused-static streaming: bottleneck isolation probe (VERDICT r3 #4).

The fused-static expectation measured 27.78 ms at 26q -- 1.42x faster
than the per-group static path but still ~2.9x over the 9.6 ms HBM
roofline for its (1+G)-pass traffic.  This probe separates the candidate
ceilings on the real chip:

  base      -- fused-static as shipped (gcap 12, br 256)
  one_call  -- gcap 14: all groups in ONE pallas call (conj read once)
  br512     -- gcap 6, 512-row blocks (fewer grid steps, bigger DMAs)
  br1024    -- gcap 3, 1024-row blocks
  z0        -- same flip masks, ALL z masks zeroed: identical HBM traffic,
               near-zero weight-plane VPU work.  base - z0 = VPU cost.
  diag      -- single x==0 group (pure sequential read, 1 state pass):
               the raw streaming throughput ceiling of this kernel shape.

Each timing is a 3-eval scaled chain marginal (same protocol as
tpu_stream_big.py).  Writes benchmarks/tpu_fusedstatic_probe.json
progressively.
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

N = int(os.environ.get("QSFH_FSPROBE_N", "26"))
OUT = os.path.join(HERE, "tpu_fusedstatic_probe.json")
RESULT = {"n_qubits": N, "time": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}


def save():
    with open(OUT + ".tmp", "w") as f:
        json.dump(RESULT, f, indent=1)
    os.replace(OUT + ".tmp", OUT)


def main() -> int:
    import jax

    on_cpu = jax.devices()[0].platform == "cpu"
    if on_cpu and not os.environ.get("QSFH_PROFILE_ALLOW_CPU"):
        print("no TPU; refusing", file=sys.stderr)
        return 1
    import jax.numpy as jnp

    from qsfh_tpu.algos.base import HubbardProblem
    from qsfh_tpu.engine.expectation import Observable
    from qsfh_tpu.engine import pallas_kernels as pk
    from qsfh_tpu.engine.product_state import product_expectation, product_planes_fn

    t0 = time.time()

    def log(msg):
        print(f"[fsprobe +{time.time()-t0:6.1f}s] {msg}", file=sys.stderr, flush=True)

    lattice = {12: (2, 3), 26: (1, 13)}[N]
    x, y = lattice
    sites = x * y
    p = HubbardProblem(x, y, 1.0, 6.0, sites, (sites + 1) // 2, sites // 2)
    obs = Observable(p.qubit_hamiltonian, N)
    xs, zs, cre, cim = obs._scan_terms()
    cre32, cim32 = cre.astype(np.float32), cim.astype(np.float32)
    RESULT["h_terms"] = len(obs)
    RESULT["platform"] = str(jax.devices()[0])

    seed = int(time.time()) % 100000
    rng = np.random.default_rng(seed)
    th = rng.uniform(0.4, 2.7, N)
    al = rng.uniform(-np.pi, np.pi, N)
    e_closed = product_expectation(p.qubit_hamiltonian, N, th, al)
    build = product_planes_fn(N, th, al)
    scales = [1.0 + 1e-3 * k for k in range(3)]
    e3_closed = e_closed * sum(scales)
    log(f"n={N}, {len(obs)} terms, E_closed {e_closed:.6f}")

    def timed_chain(fn, label, check=None):
        """3-eval scaled chain, 1-eval chain; marginal = (t3-t1)/2."""
        @jax.jit
        def chain3():
            re, im = build()
            tot = jnp.float32(0.0)
            for s in scales:
                tot = tot + fn(re, im, np.float32(s))
            return tot

        @jax.jit
        def chain1():
            re, im = build()
            return fn(re, im, np.float32(1.0))

        v3 = float(chain3())  # compile+warm
        v1 = float(chain1())
        if check is not None:
            rel = abs(v3 - check) / max(abs(check), 1e-9)
            RESULT[label + "_rel_err"] = rel
            if rel > 5e-3:
                log(f"{label}: WRONG (rel {rel:.2e})")
        t3s, t1s = [], []
        for _ in range(5):
            s0 = time.time()
            float(chain1())
            t1s.append(time.time() - s0)
            s0 = time.time()
            float(chain3())
            t3s.append(time.time() - s0)
        m = (float(np.median(t3s)) - float(np.median(t1s))) / 2.0
        RESULT[label + "_marginal_ms"] = round(1e3 * m, 2)
        log(f"{label}: {RESULT[label + '_marginal_ms']} ms/eval")
        save()

    def fused_static(re, im, s):
        return pk.expectation_stream_fused_static(
            re, im, N, xs, zs, cre32 * s, cim32 * s
        )

    # base (gcap 12, br 256 default)
    timed_chain(fused_static, "base", check=e3_closed)

    # one_call: every group in a single pallas call
    os.environ["QSFH_STREAM_FUSED_GROUPS"] = "64"
    timed_chain(fused_static, "one_call", check=e3_closed)

    # bigger blocks, fewer groups per call (VMEM budget)
    for br, gcap, label in ((512, 6, "br512"), (1024, 3, "br1024")):
        os.environ["QSFH_PALLAS_STREAM_ROWS"] = str(br)
        os.environ["QSFH_STREAM_FUSED_GROUPS"] = str(gcap)
        try:
            timed_chain(fused_static, label, check=e3_closed)
        except Exception as exc:
            RESULT[label + "_error"] = f"{type(exc).__name__}: {exc}"[:160]
            log(f"{label} failed: {RESULT[label + '_error']}")
            save()
    os.environ.pop("QSFH_PALLAS_STREAM_ROWS", None)
    os.environ["QSFH_STREAM_FUSED_GROUPS"] = "12"

    # roll: XOR permutes as VPU roll+select instead of MXU matmuls /
    # transposes (QSFH_STREAM_ROLL=1) -- the candidate fix for the
    # MXU-bound ceiling (plain XLA streams this chip at 910 GB/s,
    # tpu_hbm_peak.json, while base sits at ~235 GB/s)
    os.environ["QSFH_STREAM_ROLL"] = "1"
    try:
        timed_chain(fused_static, "roll", check=e3_closed)
        os.environ["QSFH_STREAM_FUSED_GROUPS"] = "64"
        timed_chain(fused_static, "roll_one_call", check=e3_closed)
        # block-size ladder on top of the roll+one-call winner: larger row
        # blocks amortize grid overhead per DMA, if VMEM allows
        for br in (512, 1024):
            os.environ["QSFH_PALLAS_STREAM_ROWS"] = str(br)
            try:
                timed_chain(fused_static, f"roll_one_call_br{br}",
                            check=e3_closed)
            except Exception as exc:
                RESULT[f"roll_one_call_br{br}_error"] = (
                    f"{type(exc).__name__}: {exc}"[:160])
                log(f"roll br{br} failed")
                save()
        os.environ.pop("QSFH_PALLAS_STREAM_ROWS", None)
    except Exception as exc:
        RESULT["roll_error"] = f"{type(exc).__name__}: {exc}"[:160]
        log(f"roll failed: {RESULT['roll_error']}")
        save()
    os.environ["QSFH_STREAM_ROLL"] = "0"
    os.environ["QSFH_STREAM_FUSED_GROUPS"] = "12"

    # roll also applies to the per-group static path (the production
    # expectation_stream_planes route)
    from qsfh_tpu.engine.pallas_kernels import expectation_stream_planes

    def per_group(re, im, s):
        return expectation_stream_planes(
            re, im, N, xs, zs, cre32 * s, cim32 * s
        )

    os.environ["QSFH_STREAM_ROLL"] = "1"
    try:
        timed_chain(per_group, "roll_per_group", check=e3_closed)
    except Exception as exc:
        RESULT["roll_per_group_error"] = f"{type(exc).__name__}: {exc}"[:160]
        save()
    os.environ["QSFH_STREAM_ROLL"] = "0"

    # z0: identical flip traffic, trivial weights -> isolates VPU cost
    zs0 = np.zeros_like(zs)

    def fused_static_z0(re, im, s):
        return pk.expectation_stream_fused_static(
            re, im, N, xs, zs0, cre32 * s, cim32 * s
        )

    timed_chain(fused_static_z0, "z0")

    # diag: ONE x==0 group (pure sequential read, 1 state pass)
    xs_d = np.zeros_like(xs)

    def fused_static_diag(re, im, s):
        return pk.expectation_stream_fused_static(
            re, im, N, xs_d, zs, cre32 * s, cim32 * s
        )

    timed_chain(fused_static_diag, "diag")

    RESULT["seed"] = seed
    save()
    print("tpu_fusedstatic_probe: " + json.dumps(RESULT))
    return 0


if __name__ == "__main__":
    sys.exit(main())
