#!/usr/bin/env python
"""On-chip ADAPT pool screening at 22/24 qubits (QSFH_SCREEN_N).

The per-epoch hot op of ADAPT (`/root/reference/models/adapt_vqe.py:306-314`
evaluates every pool gradient in one backprop pass; this framework's
replacement is w = H|psi> + one streamed pass over the packed pool,
PackedPool.screen_scan).  The 18q VMEM-chain form is validated/timed in
tpu_screen.json; this harness covers the HBM-streaming route the 22q/24q
train steps use (VERDICT r3 weak #6: "no on-chip screening leg exists at
those sizes").

Validation is host-float64: |psi> is a seeded product state (exact host
construction at 2^N c128), w = H|psi> and the pool gradients
2 Im <w|G_k|psi> are recomputed in numpy for a subset of generators
(device argmax + spread sample) and compared elementwise.

Timing is marginal (chain k=1 vs k=3 inside one jit, coefficients scaled
per slot so XLA cannot CSE the legs) for the two stages separately:
the H-apply and the pool screening sweep.

Writes benchmarks/tpu_screen_{N}.json.  CPU smoke: --cpu +
QSFH_PROFILE_ALLOW_CPU=1 + QSFH_SCREEN_N=12 writes to /tmp.
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

N = int(os.environ.get("QSFH_SCREEN_N", "24"))
_LATTICE = {12: (2, 3), 20: (2, 5), 22: (1, 11), 24: (2, 6)}
K_CHAIN = 3


def main() -> int:
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu" or "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    on_cpu = jax.devices()[0].platform == "cpu"
    if on_cpu and not os.environ.get("QSFH_PROFILE_ALLOW_CPU"):
        print("tpu_screen_24: no TPU platform; refusing to record", file=sys.stderr)
        return 1

    import jax.numpy as jnp

    from qsfh_tpu.algos.base import HubbardProblem
    from qsfh_tpu.engine.expectation import Observable, PackedPool
    from qsfh_tpu.engine.product_state import product_planes_fn, product_state_host
    from qsfh_tpu.ops.jw import jordan_wigner
    from qsfh_tpu.engine.state import qmask_to_bmask
    from qsfh_tpu.ops.pool import hubbard_interaction_pool_simplified

    t0 = time.time()

    def log(msg):
        print(f"[scr +{time.time()-t0:6.1f}s] {msg}", file=sys.stderr, flush=True)

    x, y = _LATTICE[N]
    sites = x * y
    p = HubbardProblem(x, y, 1.0, 6.0, sites, (sites + 1) // 2, sites // 2)
    assert p.n_qubits == N
    obs = Observable(p.qubit_hamiltonian, N)

    qubit_pool = [jordan_wigner(g) for g in hubbard_interaction_pool_simplified(x, y)]
    pool = PackedPool(qubit_pool, N)
    xs, zs, cre, cim, ks = pool.scan_arrays()
    log(f"n={N} ({x}x{y}): H {len(obs)} terms, pool {pool.size} generators "
        f"/ {len(ks)} flat terms")

    seed = int(os.environ.get("QSFH_SCREEN_SEED", str(int(time.time()) % 100000)))
    rng = np.random.default_rng(seed)
    th = rng.uniform(0.4, 2.7, N)
    al = rng.uniform(-np.pi, np.pi, N)
    build = product_planes_fn(N, th, al)

    # CHUNKED sweep: the full 2x6 pool is ~800 generators / ~500 distinct
    # flip groups -> ONE streaming program of that size took ~28 min to
    # come back from the tunneled compile service (killed by its own
    # timeout on the first attempt).  Chunks of <=64 generators compile in
    # seconds each and the sweep time is their sum (each chunk is
    # DMA-bound and independent) -- also the deployable shape for big-n
    # screening against a ~100 s compile-service ceiling.
    chunk_sz = int(os.environ.get("QSFH_SCREEN_CHUNK", "64"))
    chunks = [
        PackedPool(qubit_pool[lo:lo + chunk_sz], N)
        for lo in range(0, pool.size, chunk_sz)
    ]

    @jax.jit
    def w_state():
        re, im = build()
        psi = (re + 1j * im).reshape(-1).astype(jnp.complex64)
        return psi, obs.apply_auto(psi)

    def chunk_fn(pk):
        @jax.jit
        def f(psi, w):
            return pk.screen_scan(psi, w)
        return f

    chunk_fns = [chunk_fn(pk) for pk in chunks]
    psi_dev, w_dev = w_state()
    parts = []
    for i, f in enumerate(chunk_fns):
        parts.append(np.asarray(f(psi_dev, w_dev)))
        log(f"chunk {i + 1}/{len(chunks)} screened ({len(parts[-1])} gens)")
    grads_dev = np.concatenate(parts)
    k_arg = int(np.abs(grads_dev).argmax())
    log(f"device grads: |g|max = {abs(grads_dev[k_arg]):.6e} at generator {k_arg}")

    out = {
        "platform": str(jax.devices()[0]),
        "n_qubits": N,
        "lattice": f"{x}x{y}",
        "h_terms": len(obs),
        "pool_generators": pool.size,
        "pool_flat_terms": int(len(ks)),
        "seed": seed,
    }
    dest = HERE if not on_cpu else "/tmp"
    path = os.path.join(dest, f"tpu_screen_{N}.json")

    def flush():
        with open(path, "w") as f:
            json.dump(out, f, indent=1)

    flush()

    # -- host float64 reference on a validation subset ------------------------------
    dim = 1 << N
    idx = np.arange(dim, dtype=np.int64)
    psi_h = product_state_host(N, th, al)

    def apply_string(v, qx, qz, c):
        """c * X^x Z^z |v> (plain PauliSum term convention: the coefficient
        carries any phases; Z acts first, so the sign rides the INPUT index)."""
        xb = qmask_to_bmask(qx, N)
        zb = qmask_to_bmask(qz, N)
        if zb:
            v = v * (1.0 - 2.0 * (np.bitwise_count(idx & zb) & 1).astype(np.float64))
        return c * (v[idx ^ xb] if xb else v)

    w_h = np.zeros(dim, dtype=np.complex128)
    for qx, qz, c in zip(p.qubit_hamiltonian.x, p.qubit_hamiltonian.z,
                         p.qubit_hamiltonian.c):
        w_h += apply_string(psi_h, int(qx), int(qz), complex(c))
    log(f"host w = H|psi> done ({len(obs)} terms)")

    n_sample = min(pool.size, 24)
    subset = sorted(set(
        [k_arg] + list(rng.choice(pool.size, n_sample, replace=False))
    ))
    grads_host = {}
    for k in subset:
        g = qubit_pool[k]
        acc = 0.0 + 0.0j
        for qx, qz, c in zip(g.x, g.z, g.c):
            acc += np.vdot(w_h, apply_string(psi_h, int(qx), int(qz), complex(c)))
        grads_host[k] = 2.0 * acc.imag
    hvals = np.array([grads_host[k] for k in subset])
    dvals = grads_dev[subset]
    scale = max(float(np.abs(hvals).max()), 1e-9)
    err = float(np.abs(dvals - hvals).max()) / scale
    argmax_ok = bool(subset[int(np.abs(dvals).argmax())] == k_arg
                     and abs(grads_host[k_arg] - grads_dev[k_arg]) / scale < 5e-3)
    out["validated_generators"] = len(subset)
    out["screen_max_rel_err"] = err
    out["screen_argmax_match"] = argmax_ok
    out["screen_correct"] = bool(err < 5e-3 and argmax_ok)
    log(f"subset of {len(subset)}: max rel err {err:.2e}, argmax ok {argmax_ok}")
    flush()

    if not out["screen_correct"]:
        print("tpu_screen_24:", json.dumps(out))
        return 1

    # -- marginal timing: apply stage + per-chunk sweep marginals --------------------
    scales = [1.0 + 1e-3 * k for k in range(K_CHAIN)]

    @jax.jit
    def apply_chain():
        re, im = build()
        psi = (re + 1j * im).reshape(-1).astype(jnp.complex64)
        tot = jnp.float32(0.0)
        for s in scales:
            w = Observable(p.qubit_hamiltonian * s, N).apply_auto(psi)
            tot = tot + jnp.sum(jnp.real(w) ** 2 + jnp.imag(w) ** 2)
        return tot

    def marginal(f1, fk, label):
        t1s, tks = [], []
        float(f1())  # compile + warm both chain lengths BEFORE timing
        float(fk())  # (round-2 session-7 rule: unwarmed-chain compile
        for _ in range(5):  # otherwise lands in the "marginal")
            s0 = time.time()
            float(f1())
            t1s.append(time.time() - s0)
        for _ in range(5):
            s0 = time.time()
            float(fk())
            tks.append(time.time() - s0)
        m = 1e3 * (float(np.median(tks)) - float(np.median(t1s))) / (K_CHAIN - 1)
        log(f"{label}: single {1e3*np.median(t1s):.2f} ms fetch-synced, "
            f"marginal {m:.2f} ms")
        return round(m, 2), round(1e3 * float(np.median(t1s)), 2)

    @jax.jit
    def apply_once():
        re, im = build()
        psi = (re + 1j * im).reshape(-1).astype(jnp.complex64)
        w = obs.apply_auto(psi)
        return jnp.sum(jnp.real(w) ** 2 + jnp.imag(w) ** 2)

    out["apply_marginal_ms"], out["apply_fetch_synced_ms"] = marginal(
        apply_once, apply_chain, "H-apply")
    flush()

    # per-chunk sweep marginals: k=1 vs k=3 legs with per-leg-scaled
    # coefficients (grads are linear in c, so scaling defeats CSE without
    # touching the planes); each chunk is DMA-bound and independent, so
    # the sweep time is the sum of chunk marginals
    sweep_ms = 0.0
    per_chunk = []
    subpools = [qubit_pool[lo:lo + chunk_sz]
                for lo in range(0, pool.size, chunk_sz)]
    for ci, (pk, sub) in enumerate(zip(chunks, subpools)):
        @jax.jit
        def f1(psi, w, pk=pk):
            return jnp.sum(pk.screen_scan(psi, w))

        pks = [PackedPool([g * s for g in sub], N) for s in scales]

        @jax.jit
        def fk(psi, w, pks=pks):
            tot = jnp.float32(0.0)
            for pk_s in pks:
                tot = tot + jnp.sum(pk_s.screen_scan(psi, w))
            return tot

        m, _single = marginal(
            lambda: f1(psi_dev, w_dev), lambda: fk(psi_dev, w_dev),
            f"chunk {ci}")
        per_chunk.append(m)
        sweep_ms += max(m, 0.0)
        out["screen_chunks"] = len(chunks)
        out["screen_chunk_marginal_ms"] = per_chunk
        out["screen_sweep_ms"] = round(sweep_ms, 2)
        flush()
    out["screen_step_ms"] = round(out["apply_marginal_ms"] + sweep_ms, 2)
    flush()

    print("tpu_screen_24:", json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
