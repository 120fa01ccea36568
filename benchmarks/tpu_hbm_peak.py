#!/usr/bin/env python
"""Measured ACHIEVABLE HBM bandwidth of this chip (plain XLA ops).

The roofline table (tpu_utilization.json) divides by the v5e spec sheet
(819 GB/s).  This probe measures what simple, unambiguously
bandwidth-bound XLA programs actually sustain on the tunneled chip:
  sum_f32    -- reduce 2^28 f32 (1.07 GB read)
Marginal chain protocol (K=3 vs 1) cancels dispatch/fetch RTT.
Writes benchmarks/tpu_hbm_peak.json.
"""
import json, os, sys, time
import numpy as np
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

def main():
    import jax, jax.numpy as jnp
    if jax.devices()[0].platform == "cpu" and not os.environ.get("QSFH_PROFILE_ALLOW_CPU"):
        return 1
    out = {"platform": str(jax.devices()[0]),
           "time": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}

    n = 1 << 28
    salt = np.float32((time.time() % 100) * 1e-6)

    @jax.jit
    def mk():
        i = jax.lax.iota(jnp.float32, n)
        return i * jnp.float32(1e-9) + salt

    def marginal(fn1, fn3, label, bytes_per):
        float(np.asarray(fn3()).ravel()[0])  # compile+warm
        float(np.asarray(fn1()).ravel()[0])
        t1s, t3s = [], []
        for _ in range(5):
            s0 = time.time(); float(np.asarray(fn1()).ravel()[0]); t1s.append(time.time()-s0)
            s0 = time.time(); float(np.asarray(fn3()).ravel()[0]); t3s.append(time.time()-s0)
        m = (float(np.median(t3s)) - float(np.median(t1s))) / 2.0
        out[label + "_ms"] = round(1e3 * m, 2)
        out[label + "_GBps"] = round(bytes_per / m / 1e9, 1)
        print(label, out[label + "_ms"], "ms", out[label + "_GBps"], "GB/s",
              file=sys.stderr, flush=True)

    x = mk()

    @jax.jit
    def sum1(v):
        return jnp.sum(v)

    @jax.jit
    def sum3(v):
        # 3 independent-scaled reductions of the same array: XLA cannot
        # fuse them into one pass? it CAN -- so chain data-dependently
        a = jnp.sum(v)
        b = jnp.sum(v * (jnp.float32(1.0) + a * jnp.float32(1e-30)))
        c = jnp.sum(v * (jnp.float32(1.0) + b * jnp.float32(1e-30)))
        return c

    marginal(lambda: sum1(x), lambda: sum3(x), "sum_f32", n * 4)

    with open(os.path.join(HERE, "tpu_hbm_peak.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("tpu_hbm_peak: " + json.dumps(out))
    return 0

if __name__ == "__main__":
    sys.exit(main())
