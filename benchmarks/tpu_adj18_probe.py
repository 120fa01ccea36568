#!/usr/bin/env python
"""Can the VMEM-resident ADJOINT chain kernel run at n=18 now?

`adjoint_chain_max_qubits()` was capped at 17 on 2026-08-17 after a
measured AOT OOM: 19.3 MB scoped VMEM vs the 16 MB v5e limit, dominated
by the 3-pass HIGHEST permutation matmuls and full-plane parity signs.
The separable sign planes (round 3, `_parity_sign` row x lane
factorization) removed the full-plane sign temporaries, so the budget
may fit today.  If it does, the flagship 3x3 growth loop (1255-op
ansatz, 18 qubits) can move its adjoint off the XLA reverse scan that
currently costs ~1 s/iter while the pallas forward chain does ~5 us per
rotation.

Phases (each writes incrementally to tpu_adj18.json):
  A. correctness: T=24 synthetic terms, pallas adjoint vs host-f64
     reference sweep (grads, psi0, lam0).
  B. fit+timing:  T=1280 (5 chunks of 256) -- the flagship's ansatz
     size; fetch-synced marginal timing under the bench exclusivity
     guard.

Reference counterpart being beaten: the reference differentiates its
ansatz with lightning.qubit/GPU adjoint (reference models/adapt_vqe.py
:299-304); this kernel is the TPU-native equivalent of that hot path.
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, "..")
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402  (chip-exclusivity guard)
from qsfh_tpu.engine.pallas_kernels import adjoint_chain_pallas  # noqa: E402

N = 18
ROWS = (1 << N) // 128
OUT = os.path.join(HERE, "tpu_adj18.json")
RESULT = {"n": N, "time": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
          "git": os.popen("git -C %s rev-parse --short HEAD" % ROOT).read().strip()}
SALT = np.float32((time.time() % 997) * 1e-30)


def save():
    with open(OUT + ".tmp", "w") as f:
        json.dump(RESULT, f, indent=1)
    os.replace(OUT + ".tmp", OUT)


def terms(T, seed):
    rng = np.random.default_rng(seed)
    xs = rng.integers(1, 1 << N, T, dtype=np.uint32)
    zs = rng.integers(0, 1 << N, T, dtype=np.uint32)
    ang = rng.normal(0, 0.3, T).astype(np.float32)
    sc = rng.choice([1.0, 2.0, -1.0], T).astype(np.float32)
    # mix real (ph=1) and imaginary (ph=i) Pauli phases like real JW terms
    im_mask = rng.random(T) < 0.5
    phre = np.where(im_mask, 0.0, 1.0).astype(np.float32)
    phim = np.where(im_mask, 1.0, 0.0).astype(np.float32)
    return xs, zs, ang, sc, phre, phim


def states(seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(2, 2, ROWS, 128)).astype(np.float32)
    v /= np.sqrt((v ** 2).sum((1, 2, 3)))[:, None, None, None]
    return v  # [psi/lam, re/im, rows, lane]


def host_reference(v, xs, zs, ang, sc, phre, phim):
    """f64 host sweep with the kernel's exact semantics.

    Applies the SAME salt as the device fn so the parity check stays
    honest at any salt value (at the 1e-30 default this is a rounding
    no-op, but the check must not silently loosen if it grows)."""
    psi = ((v[0, 0].astype(np.float64) + float(SALT))
           + 1j * v[0, 1].astype(np.float64)).reshape(-1)
    lam = ((v[1, 0].astype(np.float64) + float(SALT))
           + 1j * v[1, 1].astype(np.float64)).reshape(-1)
    b = np.arange(1 << N, dtype=np.uint64)
    contribs = np.zeros(len(xs))
    for i in range(len(xs)):
        ph = phre[i] + 1j * phim[i]
        s = 1.0 - 2.0 * (np.bitwise_count(b & np.uint64(zs[i])) & 1).astype(np.float64)
        Ppsi = ph * s * psi[b ^ np.uint64(xs[i])]
        Plam = ph * s * lam[b ^ np.uint64(xs[i])]
        contribs[i] = sc[i] * np.imag(np.vdot(lam, Ppsi))
        c, sn = np.cos(ang[i]), np.sin(ang[i])
        psi = c * psi + 1j * sn * Ppsi
        lam = c * lam + 1j * sn * Plam
    return psi, lam, contribs


def build_fn():
    @jax.jit
    def fn(v, xs, zs, ang, sc, phre, phim):
        psi = ((v[0, 0] + SALT) + 1j * v[0, 1]).reshape(-1)
        lam = ((v[1, 0] + SALT) + 1j * v[1, 1]).reshape(-1)
        psi0, lam0, contribs = adjoint_chain_pallas(
            psi, lam, N, xs, zs, ang, sc, phre, phim)
        pr = jnp.stack([jnp.real(psi0), jnp.imag(psi0)]).reshape(2, ROWS, 128)
        lr = jnp.stack([jnp.real(lam0), jnp.imag(lam0)]).reshape(2, ROWS, 128)
        return pr, lr, contribs
    return fn


def main():
    dev = jax.devices()[0]
    print("platform:", dev, flush=True)
    RESULT["platform"] = str(dev)

    # ---- phase A: correctness at T=24 -------------------------------
    T = 24
    xs, zs, ang, sc, phre, phim = terms(T, 7)
    v = states(11)
    fn = build_fn()
    args = (jax.device_put(v), jnp.asarray(xs), jnp.asarray(zs),
            jnp.asarray(ang), jnp.asarray(sc), jnp.asarray(phre),
            jnp.asarray(phim))
    t0 = time.time()
    try:
        pr, lr, contribs = (np.asarray(o) for o in fn(*args))
    except Exception as e:  # noqa: BLE001 -- record the OOM verbatim
        RESULT["fit"] = False
        RESULT["error"] = repr(e)[:2000]
        save()
        print("ADJOINT CHAIN AT n=18 FAILED:", repr(e)[:500], flush=True)
        return 1
    RESULT["fit"] = True
    RESULT["first_call_s"] = round(time.time() - t0, 2)
    print(f"compiled+ran in {RESULT['first_call_s']}s", flush=True)

    hpsi, hlam, hcontrib = host_reference(v, xs, zs, ang, sc, phre, phim)
    gpsi = (pr[0] + 1j * pr[1]).reshape(-1)
    glam = (lr[0] + 1j * lr[1]).reshape(-1)
    RESULT["parity"] = {
        "psi0_max_abs_err": float(np.abs(gpsi - hpsi).max()),
        "lam0_max_abs_err": float(np.abs(glam - hlam).max()),
        "grad_max_abs_err": float(np.abs(contribs[:T] - hcontrib).max()),
        "grad_max_rel_err": float(np.max(
            np.abs(contribs[:T] - hcontrib) / np.maximum(np.abs(hcontrib), 1e-12))),
    }
    save()
    print("parity:", RESULT["parity"], flush=True)

    # ---- phase B: flagship-size timing (T=1280, 5 chunks) -----------
    if os.environ.get("QSFH_ADJ18_SKIP_B") == "1":
        print("phase B skipped (QSFH_ADJ18_SKIP_B=1)", flush=True)
        return 0
    T = int(os.environ.get("QSFH_ADJ18_T", "1280"))
    xs, zs, ang, sc, phre, phim = terms(T, 13)
    big = (jax.device_put(v), jnp.asarray(xs), jnp.asarray(zs),
           jnp.asarray(ang), jnp.asarray(sc), jnp.asarray(phre),
           jnp.asarray(phim))
    t0 = time.time()
    out = fn(*big)
    np.asarray(out[2])  # fetch = proof of execution
    # the T=24 -> T=1280 shape change forces a fresh trace/compile, so
    # this first call includes recompilation; the 5 timed runs below are
    # the true warm numbers
    RESULT[f"t{T}_first_call_s"] = round(time.time() - t0, 2)
    save()
    with bench._chip_exclusive():
        times = []
        for _ in range(5):
            t0 = time.time()
            np.asarray(fn(*big)[2])
            times.append(time.time() - t0)
    RESULT[f"t{T}_ms_median"] = round(1e3 * float(np.median(times)), 3)
    RESULT[f"t{T}_ms_all"] = [round(1e3 * t, 2) for t in times]
    RESULT[f"t{T}_per_term_us"] = round(1e6 * float(np.median(times)) / T, 3)
    save()
    print(f"T={T} adjoint sweep: {RESULT[f't{T}_ms_median']} ms median "
          f"({RESULT[f't{T}_per_term_us']} us/term)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
