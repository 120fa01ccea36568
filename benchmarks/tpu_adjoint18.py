#!/usr/bin/env python
"""On-chip 18q adjoint shoot-out: XLA reverse scan vs Pallas adjoint chain.

The flagship 3x3 continuation steps at ~3.7 s/iter with the adjoint as
ONE XLA reverse scan over ~5.9k rotation terms (the pallas adjoint chain
does not fit VMEM at n=18 with the 3-matmul dynamic permute: 19.3 MB vs
16 MB, measured AOT OOM 2026-08-17).  The swap-based permute
(QSFH_PERMUTE_V2=1) drops the mid/top matmul temporaries; this harness
answers, ON THE CHIP:

  a) does the adjoint chain now compile/execute at n=18 with V2?
  b) is it numerically equal to the XLA scan (same c64 math)?
  c) marginal ms per 1k adjoint terms for each lowering?

Synthetic segment: T random single/two-axis rotation terms at n=18 (the
term-count scale of a 700-op momentum-pool ansatz).  Writes
benchmarks/tpu_adjoint18.json.  CPU smoke: --cpu QSFH_PROFILE_ALLOW_CPU=1
(T shrinks, interpret mode).
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

N = int(os.environ.get("QSFH_ADJ18_N", "18"))
T = int(os.environ.get("QSFH_ADJ18_T", "1024"))
SALT = float(os.environ.get("QSFH_BENCH_SALT", "0") or 0)


def main() -> int:
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu" or "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        globals()["T"] = min(T, 64)
    on_cpu = jax.devices()[0].platform == "cpu"
    if on_cpu and not os.environ.get("QSFH_PROFILE_ALLOW_CPU"):
        print("tpu_adjoint18: no TPU; refusing to record", file=sys.stderr)
        return 1

    import jax.numpy as jnp

    t0 = time.time()

    def log(msg):
        print(f"[adj18 +{time.time()-t0:6.1f}s] {msg}", file=sys.stderr,
              flush=True)

    rng = np.random.default_rng(7)
    # random Pauli rotation terms: x/z masks over n bits, angles, unit
    # phases (the rotation-term contract of run_rot_adjoint's inputs)
    xs = rng.integers(0, 1 << N, T, dtype=np.uint32)
    zs = rng.integers(0, 1 << N, T, dtype=np.uint32)
    angles = rng.uniform(-0.1, 0.1, T).astype(np.float32) + np.float32(SALT)
    scales = np.ones(T, np.float32)
    phre = np.ones(T, np.float32)
    phim = np.zeros(T, np.float32)

    rows = (1 << N) // 128
    psi = rng.standard_normal((2, 1 << N)).astype(np.float32)
    psi /= np.sqrt((psi ** 2).sum())
    lam = rng.standard_normal((2, 1 << N)).astype(np.float32)

    from qsfh_tpu.engine.compiled import xor_flip_traced
    from qsfh_tpu.engine.state import index_bits

    def xla_adjoint(psi_r, lam_r):
        """Reverse scan, same math as compiled.run_rot_adjoint's fallback."""
        idx = index_bits(N)
        psi_c = psi_r[0] + 1j * psi_r[1]
        lam_c = lam_r[0] + 1j * lam_r[1]

        def body(carry, term):
            p, l = carry
            xb, zb, ang = term
            par = jax.lax.population_count(idx & zb) & jnp.uint32(1)
            s = (1.0 - 2.0 * par.astype(jnp.float32)).astype(p.dtype)
            pp = s * xor_flip_traced(p, N, xb)
            contrib = jnp.imag(jnp.vdot(l, pp)).astype(jnp.float32)
            c = jnp.cos(ang).astype(p.dtype)
            sn = jnp.sin(ang).astype(p.dtype)
            p = c * p + 1j * sn * pp
            pl = s * xor_flip_traced(l, N, xb)
            l = c * l + 1j * sn * pl
            return (p, l), contrib

        terms = (jnp.asarray(xs[::-1].copy()), jnp.asarray(zs[::-1].copy()),
                 jnp.asarray(angles[::-1].copy()))
        (_, _), contribs = jax.lax.scan(body, (psi_c, lam_c), terms)
        return contribs

    def pallas_adjoint(psi_r, lam_r):
        from qsfh_tpu.engine.pallas_kernels import adjoint_chain_pallas

        psi_c = psi_r[0] + 1j * psi_r[1]
        lam_c = lam_r[0] + 1j * lam_r[1]
        _, _, contribs = adjoint_chain_pallas(
            psi_c, lam_c, N,
            jnp.asarray(xs[::-1].copy()), jnp.asarray(zs[::-1].copy()),
            jnp.asarray(angles[::-1].copy()), jnp.asarray(scales),
            jnp.asarray(phre), jnp.asarray(phim),
        )
        return contribs

    out = {"platform": str(jax.devices()[0]), "n_qubits": N, "terms": T}
    path = os.path.join(HERE if not on_cpu else "/tmp", "tpu_adjoint18.json")

    def flush():
        with open(path, "w") as f:
            json.dump(out, f, indent=1)

    def timed(fn, label):
        f = jax.jit(fn)
        s0 = time.time()
        ref = np.asarray(f(jnp.asarray(psi), jnp.asarray(lam)))
        out[f"{label}_first_s"] = round(time.time() - s0, 1)
        ts = []
        for _ in range(3):
            s0 = time.time()
            np.asarray(f(jnp.asarray(psi), jnp.asarray(lam)))
            ts.append(time.time() - s0)
        out[f"{label}_ms"] = round(1e3 * float(np.median(ts)), 1)
        out[f"{label}_ms_per_kterm"] = round(out[f"{label}_ms"] * 1e3 / T, 1)
        log(f"{label}: {out[f'{label}_ms']} ms ({T} terms)")
        flush()
        return ref

    ref = timed(xla_adjoint, "xla_scan")

    for v2 in ("0", "1"):
        os.environ["QSFH_PERMUTE_V2"] = v2
        os.environ["QSFH_PALLAS_ADJ_MAX_N"] = str(N)
        label = f"pallas_chain_v{int(v2)+1}"
        try:
            got = timed(pallas_adjoint, label)
            err = float(np.max(np.abs(np.asarray(got) - ref))
                        / max(float(np.max(np.abs(ref))), 1e-9))
            out[f"{label}_rel_err_vs_xla"] = err
            log(f"{label} rel err vs xla: {err:.2e}")
        except Exception as exc:
            out[f"{label}_error"] = f"{type(exc).__name__}: {exc}"[:300]
            log(f"{label} FAILED: {out[f'{label}_error']}")
        flush()

    print("tpu_adjoint18:", json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
