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
sys.path.insert(0, HERE)  # fused_harness, when loaded as a module

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

    # QSFH_FUSED_DISPATCH=stages: per-stage jitted dispatches (the
    # flagship runner's form) instead of one K-unrolled program.  At
    # 22-24q the unrolled program's streaming-adjoint structure (one
    # pallas call per block-crossing term x K) produced a 34 MB MLIR
    # payload that killed the remote compile helper (HTTP 500,
    # 2026-08-19); each stage alone compiles.  Same math, same parity
    # check -- only the host/program boundary moves.
    if os.environ.get("QSFH_FUSED_DISPATCH", "fused") == "stages":
        fns = {name: jax.jit(raw[name]) for name in
               ("fwd_from", "energy", "cotangent", "adjoint", "metrics",
                "update")}
        init = jax.jit(lambda t: optimizer.init(t))

        def stage_chain(psi0_r, th, k):
            opt = init(th)
            ys = []
            for _ in range(k):
                psi_r = fns["fwd_from"](psi0_r, th)
                e = fns["energy"](psi_r)
                lam_r = fns["cotangent"](psi_r)
                g = fns["adjoint"](psi_r, lam_r, th)
                sz, s2, fid = fns["metrics"](psi_r)
                th, opt, gn = fns["update"](th, g, opt)
                ys.append((e, sz, s2, fid, gn))
            traj = tuple(jnp.stack(col) for col in zip(*ys))
            return th, opt, traj

        th0 = np.full(len(OPS), 0.05, dtype=np.dtype(vqe._rdt))

        from qsfh_tpu.engine.state import bitpos

        index = 0
        for q in vqe._occupied_modes:
            index |= 1 << bitpos(q, vqe.n_qubits)
        arr = np.zeros((2, 1 << vqe.n_qubits), np.dtype(vqe._rdt))
        arr[0, index] = 1.0
        jpsi0, jth0 = jnp.asarray(arr), jnp.asarray(th0)
        progs = {
            k: (lambda _k=k: stage_chain(jpsi0, jth0, _k)) for k in (K1, K2)
        }
        return progs, arr, th0, True

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

    from fused_harness import kernel_path_label, measure_fused_step

    # the axon plugin registers itself regardless of JAX_PLATFORMS; the
    # config knob is the reliable way to force the CPU trace generation
    if os.environ.get("JAX_PLATFORMS") == "cpu" or "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    if jax.devices()[0].platform == "cpu" and not os.environ.get(
        "QSFH_PROFILE_ALLOW_CPU"
    ):
        print("tpu_step_fused: no TPU platform; refusing to record", file=sys.stderr)
        return 1

    t0 = time.time()
    progs, psi0, th0, zeroarg = build_multi_step()
    print(f"[fused +{time.time()-t0:6.1f}s] built", file=sys.stderr, flush=True)

    vs_baseline = None
    bl_path = os.path.join(HERE, "baseline_measurements.json")
    if os.path.exists(bl_path):
        entry = json.load(open(bl_path)).get(f"adapt_step_{N_QUBITS}q")
        if entry:
            vs_baseline = entry["sec_per_iter"]
    return measure_fused_step(
        name="tpu_step_fused",
        run_chain=lambda k: run_chain(progs, psi0, th0, k, zeroarg),
        k1=K1,
        k2=K2,
        config={"nx": NX, "ny": NY, "ops": list(OPS), "k1": K1, "k2": K2},
        expected_path=EXPECTED_PATH,
        result_path=os.path.join(HERE, RESULT_NAME),
        metric=f"adapt_vqe_train_step_{N_QUBITS}q_iters_per_sec",
        how=(
            f"single fused jit ({'zero-arg' if zeroarg else 'arg'} form): "
            f"{K2} UNROLLED full train steps (fwd+energy+cotangent+adjoint+"
            f"metrics+update, {kernel_path_label(N_QUBITS)} kernels), "
            f"marginal between chain lengths {K1}/{K2}, energies and "
            "gradient norms parity-checked vs CPU trace"
        ),
        vs_baseline=vs_baseline,
    )


if __name__ == "__main__":
    sys.exit(main())
