#!/usr/bin/env python
"""On-chip ADAPT train step, measured as ONE fused multi-iteration program.

The split-stage warm path (bench.py --warm-stages) keeps hitting the
tunneled compile service's UNIMPLEMENTED rejections: six separate
programs, six chances to land in a sick moment (and four of them had
fixed hashes, so one failure used to poison every later cycle).  This
script takes the opposite shape: the WHOLE train step (fwd circuit +
energy + cotangent + adjoint gradient + Sz/S^2/fidelity metrics + Adam
update) composed from ADAPT's raw split stages and UNROLLED K iterations
inside a SINGLE jitted program (scan-over-pallas costs the compile
service ~150 s even for tiny bodies; unrolled calls compile in seconds).  With the Pallas chain kernels default-on
this is the program-shape class the chip demonstrably accepts
(benchmarks/tpu_pallas.json: scan-over-chain programs compile + run).

One program, one salt, one fetch.  Timing is MARGINAL between two chain
lengths -- (t(K2)-t(K1))/(K2-K1) -- which cancels the tunnel-RTT constant
(see bench.py).  The final energies of the K-chain are fetched, which
proves every prior iteration executed, and are checked against a
CPU-generated expected trace (step_fused_expected.json) so a silently
wrong on-chip program can never record a number.

Writes benchmarks/tpu_result.json in bench.py's emit format; bench.py
then reports it as the recorded on-chip measurement whenever a live
window isn't available.
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

# Lattice/chain knobs (env-overridable).  The default 3x3 = 18 qubits is
# the reference's largest configured problem; QSFH_FUSED_NX=2 QSFH_FUSED_NY=5
# measures a 20-qubit step -- past the reference's single-device ceiling
# (/root/reference/models/adapt_vqe.py:299-304 switches backends at >=20q),
# exercising the HBM-streaming Pallas kernels on-chip while the CPU trace
# takes the XLA path (a genuine cross-implementation parity check).
NX = int(os.environ.get("QSFH_FUSED_NX", "3"))
NY = int(os.environ.get("QSFH_FUSED_NY", "3"))
N_ANSATZ = int(os.environ.get("QSFH_FUSED_ANSATZ", "12"))
K1 = int(os.environ.get("QSFH_FUSED_K1", "2"))
K2 = int(os.environ.get("QSFH_FUSED_K2", "6"))
N_QUBITS = 2 * NX * NY
# ansatz = first N_ANSATZ pool ops unless an explicit comma list is given
# (some lattices put the leading pool ops on a symmetry plateau)
_OPS_ENV = os.environ.get("QSFH_FUSED_OPS", "")
OPS = tuple(int(s) for s in _OPS_ENV.split(",") if s) or tuple(range(N_ANSATZ))
# the 18q flagship keeps its historical artifact names
_SUFFIX = "" if (NX, NY) == (3, 3) else f"_{N_QUBITS}q"
EXPECTED_PATH = os.path.join(HERE, f"step_fused_expected{_SUFFIX}.json")
RESULT_NAME = f"tpu_result{_SUFFIX}.json"


def build_multi_step():
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
        log_metrics=False, circuit_mode="split",
        program_salt=float(os.environ.get("QSFH_BENCH_SALT", "0") or 0),
    )
    indices = OPS
    optimizer = optax.adam(1e-2)
    raw = vqe._build_step(indices, optimizer).raw_stages

    def one_step(psi0_r, carry, _):
        th, opt = carry
        # fwd_from: |psi0> is a host input -- tracing the basis one-hot
        # costs the compile service ~2 min (tpu_bisect_basis.jsonl)
        psi_r = raw["fwd_from"](psi0_r, th)
        e = raw["energy"](psi_r)
        lam_r = raw["cotangent"](psi_r)
        g = raw["adjoint"](psi_r, lam_r, th)
        sz, s2, fid = raw["metrics"](psi_r)
        th, opt, gn = raw["update"](th, g, opt)
        return (th, opt), (e, sz, s2, fid, gn)

    def multi(psi0_r, th, k):
        # UNROLLED over iterations: a lax.scan whose body contains pallas
        # calls costs the remote compile service ~150 s even for two tiny
        # chunks (tpu_bisect_basis.jsonl chain_scan2), while the same
        # calls unrolled compile in seconds.  optimizer.init is traced
        # INSIDE the program: an eager optax init dispatches fixed-hash
        # device programs (poisonable on the tunneled service; see
        # engine/state.py real_dtype).
        carry, ys = (th, optimizer.init(th)), []
        for _ in range(k):
            carry, y = one_step(psi0_r, carry, None)
            ys.append(y)
        th, opt = carry
        traj = tuple(jnp.stack(col) for col in zip(*ys))
        return th, opt, traj

    th0 = np.full(len(OPS), 0.05, dtype=np.dtype(vqe._rdt))

    from qsfh_tpu.engine.state import bitpos

    index = 0
    for q in vqe._occupied_modes:
        index |= 1 << bitpos(q, vqe.n_qubits)
    arr = np.zeros((2, 1 << vqe.n_qubits), np.dtype(vqe._rdt))
    arr[0, index] = 1.0
    psi0 = arr

    # Program-form knob.  The round-2 bisect ladders first suggested an
    # args-vs-constants split, but the final minimal pairs cleared runtime
    # args entirely (tpu_bisect_args.jsonl: arg_th/arg_pr PASS) — the real
    # poison was unsalted fixed-hash device dispatches during library init,
    # now purged (engine/state.py real_dtype).  Both forms are kept: the
    # arg form is the production shape; zero-arg bakes inputs as constants
    # behind an optimization_barrier.
    zeroarg = os.environ.get("QSFH_FUSED_ZEROARG", "1") != "0"
    if zeroarg:
        jpsi0, jth0 = jnp.asarray(psi0), jnp.asarray(th0)

        def make(k):
            def prog():
                p0, th = jax.lax.optimization_barrier((jpsi0, jth0))
                return multi(p0, th, k)
            return jax.jit(prog)
        progs = {k: make(k) for k in (K1, K2)}
    else:
        progs = {
            k: jax.jit(lambda p0, th, _k=k: multi(p0, th, _k))
            for k in (K1, K2)
        }
    return progs, psi0, th0, zeroarg


def run_chain(progs, psi0, th0, k, zeroarg):
    t0 = time.time()
    if zeroarg:
        th, opt, traj = progs[k]()
    else:
        th, opt, traj = progs[k](psi0, th0)
    energies = np.asarray(traj[0])  # fetch: proves the whole chain executed
    return time.time() - t0, energies, np.asarray(traj[4])


def main() -> int:
    import jax

    # the axon plugin registers itself regardless of JAX_PLATFORMS; the
    # config knob is the reliable way to force the CPU trace generation
    if os.environ.get("JAX_PLATFORMS") == "cpu" or "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    platform = jax.devices()[0].platform
    on_cpu = platform == "cpu"
    if on_cpu and not os.environ.get("QSFH_PROFILE_ALLOW_CPU"):
        print("tpu_step_fused: no TPU platform; refusing to record", file=sys.stderr)
        return 1

    t0 = time.time()
    progs, psi0, th0, zeroarg = build_multi_step()
    print(f"[fused +{time.time()-t0:6.1f}s] built", file=sys.stderr, flush=True)

    # compile + warm both chain lengths (first call includes remote compile)
    for k in (K1, K2):
        dt, energies, gnorms = run_chain(progs, psi0, th0, k, zeroarg)
        print(
            f"[fused +{time.time()-t0:6.1f}s] K={k} first call {dt:.1f}s "
            f"E={energies.tolist()}", file=sys.stderr, flush=True,
        )

    # integrity: on-chip energies/gnorms must match the CPU-generated trace
    _, energies, gnorms = run_chain(progs, psi0, th0, K2, zeroarg)
    if on_cpu:
        with open(EXPECTED_PATH, "w") as f:
            json.dump(
                {"energies": energies.tolist(), "gnorms": gnorms.tolist()}, f
            )
        print("wrote expected trace (CPU)", file=sys.stderr)
    else:
        if not os.path.exists(EXPECTED_PATH):
            print("no expected trace; run once with JAX_PLATFORMS=cpu "
                  "QSFH_PROFILE_ALLOW_CPU=1 first", file=sys.stderr)
            return 1
        exp = json.load(open(EXPECTED_PATH))
        ref_e = np.asarray(exp["energies"])
        err = float(np.max(np.abs(energies - ref_e) / np.maximum(np.abs(ref_e), 1e-9)))
        # gnorms feed straight from the adjoint chain kernel: checking them
        # validates the on-chip gradient path, not just the forward/energy
        ref_g = np.asarray(exp["gnorms"])
        gerr = float(np.max(np.abs(gnorms - ref_g) / np.maximum(np.abs(ref_g), 1e-9)))
        print(f"[fused] max rel err vs CPU trace: energy {err:.2e} gnorm {gerr:.2e}",
              file=sys.stderr, flush=True)
        if err > 1e-3 or gerr > 1e-2:
            print("tpu_step_fused: PARITY FAIL; not recording", file=sys.stderr)
            return 1

    # marginal timing: median of 3 per chain length
    ts = {}
    for k in (K1, K2):
        samples = [run_chain(progs, psi0, th0, k, zeroarg)[0] for _ in range(3)]
        ts[k] = float(np.median(samples))
    marginal = (ts[K2] - ts[K1]) / (K2 - K1)
    print(
        f"[fused] t({K2})={ts[K2]:.3f}s t({K1})={ts[K1]:.3f}s "
        f"-> {marginal*1e3:.1f} ms/iter", file=sys.stderr, flush=True,
    )
    if marginal <= 0:
        # RTT jitter swamped the chained work: report the K2 chain's
        # per-iteration average as an honest upper bound instead
        marginal = ts[K2] / K2
        print(f"[fused] marginal invalid; upper bound {marginal*1e3:.1f} ms/iter",
              file=sys.stderr)

    iters_per_sec = 1.0 / marginal
    vs_baseline = None
    bl_path = os.path.join(HERE, "baseline_measurements.json")
    if os.path.exists(bl_path):
        entry = json.load(open(bl_path)).get(f"adapt_step_{2 * NX * NY}q")
        if entry:
            vs_baseline = round(iters_per_sec * entry["sec_per_iter"], 1)
    blob = {
        "metric": f"adapt_vqe_train_step_{2 * NX * NY}q_iters_per_sec",
        "value": round(iters_per_sec, 3),
        "unit": "iters/sec",
        "vs_baseline": vs_baseline,
        "how": (
            f"single fused jit ({'zero-arg' if zeroarg else 'arg'} form): {K2} UNROLLED full train steps "
            "(fwd+energy+cotangent+adjoint+metrics+update, pallas "
            f"{'chain' if N_QUBITS <= 18 else 'streaming'} "
            "kernels), marginal between chain lengths "
            f"{K1}/{K2}, energies parity-checked vs CPU trace"
        ),
        "platform": str(jax.devices()[0]),
    }
    dest = HERE if not on_cpu else "/tmp"
    with open(os.path.join(dest, RESULT_NAME), "w") as f:
        json.dump(blob, f)
    print("tpu_step_fused:", json.dumps(blob))
    return 0


if __name__ == "__main__":
    sys.exit(main())
