#!/usr/bin/env python
"""On-chip 26-30 qubit single-chip energy evaluation (QSFH_STREAM_BIG_N).

Validation past every host-reference scale: the statevector is a phased
product state built ON DEVICE from pure elementwise ops (no 2^n tunnel
transfer, no complex copy — engine/product_state.py), the streaming
expectation kernel (engine/pallas_kernels.expectation_stream_planes)
evaluates a full Hubbard Hamiltonian on it, and the result is checked
against the per-qubit closed form computed on the host in float64.

At 28-30 qubits this is 10-12 qubits past the reference's practical
single-device ceiling (/root/reference/models/adapt_vqe.py:299-304) on
ONE chip, no sharding.  Program shapes are value-salted by the angle
draw (fresh compile-cache hash every run).

CPU smoke: --cpu + QSFH_PROFILE_ALLOW_CPU=1 with QSFH_STREAM_BIG_N=12
runs the whole harness in interpret mode and writes to /tmp.
TPU mode writes benchmarks/tpu_stream_big_{N}.json.
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

N = int(os.environ.get("QSFH_STREAM_BIG_N", "28"))
_LATTICE = {12: (2, 3), 22: (1, 11), 24: (2, 6), 26: (1, 13), 28: (2, 7),
            30: (3, 5)}
K_CHAIN = 3


def main() -> int:
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu" or "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    on_cpu = jax.devices()[0].platform == "cpu"
    if on_cpu and not os.environ.get("QSFH_PROFILE_ALLOW_CPU"):
        print("tpu_stream_big: no TPU platform; refusing to record", file=sys.stderr)
        return 1

    import jax.numpy as jnp

    from qsfh_tpu.algos.base import HubbardProblem
    from qsfh_tpu.engine.expectation import Observable
    from qsfh_tpu.engine.pallas_kernels import expectation_stream_planes
    from qsfh_tpu.engine.product_state import product_expectation, product_planes_fn

    t0 = time.time()

    def log(msg):
        print(f"[big +{time.time()-t0:6.1f}s] {msg}", file=sys.stderr, flush=True)

    x, y = _LATTICE[N]
    sites = x * y
    p = HubbardProblem(x, y, 1.0, 6.0, sites, (sites + 1) // 2, sites // 2)
    assert p.n_qubits == N
    obs = Observable(p.qubit_hamiltonian, N)
    xs, zs, cre, cim = obs._scan_terms()
    cre32, cim32 = cre.astype(np.float32), cim.astype(np.float32)

    seed = int(os.environ.get("QSFH_STREAM_BIG_SEED", str(int(time.time()) % 100000)))
    rng = np.random.default_rng(seed)
    th = rng.uniform(0.4, 2.7, N)
    al = rng.uniform(-np.pi, np.pi, N)
    e_closed = product_expectation(p.qubit_hamiltonian, N, th, al)
    log(f"n={N} ({x}x{y}), {len(obs)} terms, seed {seed}, E_closed = {e_closed:.8f}")

    build = product_planes_fn(N, th, al)

    @jax.jit
    def once():
        re, im = build()
        norm2 = jnp.sum(re * re + im * im)
        return expectation_stream_planes(re, im, N, xs, zs, cre32, cim32), norm2

    e, norm2 = (float(v) for v in once())
    log(f"on-device E = {e:.8f}, |psi|^2 = {norm2:.8f}")

    e_err = abs(e - e_closed) / max(abs(e_closed), 1e-9)
    n_err = abs(norm2 - 1.0)
    static = os.environ.get("QSFH_STREAM_STATIC", "1") == "1"
    out = {
        "platform": str(jax.devices()[0]),
        "n_qubits": N,
        "lattice": f"{x}x{y}",
        "h_terms": len(obs),
        "stream_static": static,
        "seed": seed,
        "energy_closed_form": e_closed,
        "energy_on_device": e,
        "energy_rel_err": e_err,
        "norm_err": n_err,
        "correct": bool(e_err < 5e-3 and n_err < 1e-3),
    }
    log(f"rel err: energy {e_err:.2e}, norm {n_err:.2e}")

    dest = HERE if not on_cpu else "/tmp"
    # the dynamic-kernel baseline (QSFH_STREAM_STATIC=0) records beside the
    # static default instead of overwriting it -- the pair IS the A/B
    suffix = "" if static else "_dyn"
    path = os.path.join(dest, f"tpu_stream_big_{N}{suffix}.json")

    def flush():
        # progressive write: a sick-window timeout mid-ladder keeps every
        # leg already validated instead of discarding the whole rung
        with open(path, "w") as f:
            json.dump(out, f, indent=1)

    flush()

    if out["correct"]:
        ts = []
        for _ in range(5):
            s0 = time.time()
            float(once()[0])
            ts.append(time.time() - s0)
        out["eval_fetch_synced_ms"] = round(1e3 * float(np.median(ts)), 2)
        flush()

        # marginal device time: 3 scaled evals in one program vs 1.  The
        # scale rides the term COEFFICIENTS (host-side, E is linear in c),
        # not the planes: scaled plane copies would add 8.6 GB of peak HBM
        # at 30q and tip the 16 GB chip into OOM.
        scales = [1.0 + 1e-3 * k for k in range(K_CHAIN)]

        @jax.jit
        def chain():
            re, im = build()
            tot = jnp.float32(0.0)
            for s in scales:
                tot = tot + expectation_stream_planes(
                    re, im, N, xs, zs,
                    cre32 * np.float32(s), cim32 * np.float32(s),
                )
            return tot

        e3 = float(chain())  # compile + warm
        e3_closed = e_closed * sum(scales)
        out["chain_rel_err"] = abs(e3 - e3_closed) / max(abs(e3_closed), 1e-9)
        t3 = []
        for _ in range(5):
            s0 = time.time()
            float(chain())
            t3.append(time.time() - s0)
        t1 = float(np.median(ts))
        t3m = float(np.median(t3))
        out["eval_marginal_ms"] = round(1e3 * (t3m - t1) / (K_CHAIN - 1), 2)
        flush()

        # fused one-call expectation (scalar-prefetch partner indexing):
        # conj side streams through VMEM once total instead of per group
        from qsfh_tpu.engine.pallas_kernels import expectation_stream_fused

        @jax.jit
        def fused_chain():
            re, im = build()
            tot = jnp.float32(0.0)
            for s in scales:
                tot = tot + expectation_stream_fused(
                    re, im, N, xs, zs,
                    cre32 * np.float32(s), cim32 * np.float32(s),
                )
            return tot

        try:
            ef3 = float(fused_chain())
            out["fused_chain_rel_err"] = abs(ef3 - e3_closed) / max(
                abs(e3_closed), 1e-9
            )
            tf = []
            for _ in range(5):
                s0 = time.time()
                float(fused_chain())
                tf.append(time.time() - s0)
            tfm = float(np.median(tf))
            # same RTT constant as the grouped chain: t(K) = C + K*m, so
            # m_fused = m_grouped + (t_fused(K) - t_grouped(K)) / K
            out["fused_marginal_ms"] = round(
                out["eval_marginal_ms"] + 1e3 * (tfm - t3m) / K_CHAIN, 2
            )
            log(f"fused eval: rel {out['fused_chain_rel_err']:.2e}, "
                f"marginal {out['fused_marginal_ms']} ms")
            flush()
        except Exception as exc:  # fused is opt-in until proven on-chip
            out["fused_error"] = f"{type(exc).__name__}: {exc}"[:200]
            log(f"fused leg failed: {out['fused_error']}")

        # fused-STATIC: (1 + G) state passes AND the separable-sign static
        # per-term work in one kernel family -- the round-4 roofline
        # candidate (VERDICT r3 next #4: both known levers together)
        from qsfh_tpu.engine.pallas_kernels import (
            expectation_stream_fused_static,
        )

        @jax.jit
        def fused_static_chain():
            re, im = build()
            tot = jnp.float32(0.0)
            for s in scales:
                tot = tot + expectation_stream_fused_static(
                    re, im, N, xs, zs,
                    cre32 * np.float32(s), cim32 * np.float32(s),
                )
            return tot

        try:
            efs3 = float(fused_static_chain())
            out["fused_static_chain_rel_err"] = abs(efs3 - e3_closed) / max(
                abs(e3_closed), 1e-9
            )
            tfs = []
            for _ in range(5):
                s0 = time.time()
                float(fused_static_chain())
                tfs.append(time.time() - s0)
            tfsm = float(np.median(tfs))
            out["fused_static_marginal_ms"] = round(
                out["eval_marginal_ms"] + 1e3 * (tfsm - t3m) / K_CHAIN, 2
            )
            log(
                f"fused-static eval: rel {out['fused_static_chain_rel_err']:.2e}, "
                f"marginal {out['fused_static_marginal_ms']} ms"
            )
            flush()
        except Exception as exc:
            out["fused_static_error"] = f"{type(exc).__name__}: {exc}"[:200]
            log(f"fused-static leg failed: {out['fused_static_error']}")

        # rotated leg: streamed rotations validated via symbolic U^dag H U
        # dressing + closed form (covers the rotation stream kernels, both
        # block-crossing and diagonal-local paths, at this scale).  Skipped
        # at 30q: each streamed rotation materializes fresh output planes,
        # so input+output peak (17 GB) exceeds the 16 GB chip there.
        if N <= 28:
            from qsfh_tpu.engine.pallas_kernels import rotation_stream_planes
            from qsfh_tpu.engine.product_state import (
                rotated_hamiltonian,
                stream_rotation_inputs,
            )

            rots = [
                ((1 << 0) | (1 << (N - 1)), 0, float(rng.uniform(0.2, 1.0))),
                ((1 << 1) | (1 << (N - 2)), (1 << 1) | (1 << (N - 2)),
                 float(rng.uniform(-1.0, -0.2))),
                (0, 0b11, float(rng.uniform(0.2, 1.0))),
            ]
            dressed = rotated_hamiltonian(p.qubit_hamiltonian, rots)
            e_rot_closed = product_expectation(dressed, N, th, al)
            xb, zb, rth, phre, phim = stream_rotation_inputs(N, rots)

            @jax.jit
            def rotated():
                re, im = build()
                re, im = rotation_stream_planes(re, im, N, xb, zb, rth, phre, phim)
                return expectation_stream_planes(re, im, N, xs, zs, cre32, cim32)

            e_rot = float(rotated())
            rot_err = abs(e_rot - e_rot_closed) / max(abs(e_rot_closed), 1e-9)
            out["rot_energy_closed_form"] = e_rot_closed
            out["rot_energy_on_device"] = e_rot
            out["rot_rel_err"] = rot_err
            out["rot_dressed_terms"] = len(dressed.c)
            out["rot_correct"] = bool(rot_err < 5e-3)
            log(f"rotated leg: E = {e_rot:.8f} vs closed {e_rot_closed:.8f} "
                f"(rel {rot_err:.2e}, dressed {len(dressed.c)} terms)")
            flush()

            # screening leg: per-term 2 Im<w|c P|psi> on two DIFFERENT
            # product states (the pair matrix element is also closed-form);
            # covers the streamed screening kernel -- ADAPT's per-epoch hot
            # op -- at this scale.  w planes add 2x plane bytes: 28q max.
            from qsfh_tpu.engine.pallas_kernels import (
                screen_stream_perm,
                screen_stream_planes,
            )
            from qsfh_tpu.engine.product_state import product_pair_term_values

            thw = rng.uniform(0.4, 2.7, N)
            alw = rng.uniform(-np.pi, np.pi, N)
            build_w = product_planes_fn(N, thw, alw)

            @jax.jit
            def screened():
                re, im = build()
                wre, wim = build_w()
                contribs, _ = screen_stream_planes(
                    wre, wim, re, im, N, xs, zs, cre32, cim32
                )
                return contribs

            contribs = np.asarray(screened())
            # slot order includes the static kernels' subgroup sort; the
            # earlier group-order reconstruction misassigned terms within
            # groups, reporting ~15% phantom screen error at 26-30q
            perm = screen_stream_perm(N, xs, zs, cre32, cim32)
            vals = product_pair_term_values(
                p.qubit_hamiltonian, N, (thw, alw), (th, al)
            )
            expected = 2.0 * vals.imag
            scr_scale = max(float(np.abs(expected).max()), 1e-9)
            scr_err = float(np.abs(contribs - expected[perm]).max()) / scr_scale
            argmax_ok = bool(
                perm[int(np.abs(contribs).argmax())]
                == int(np.abs(expected).argmax())
            )
            out["screen_max_rel_err"] = scr_err
            out["screen_argmax_match"] = argmax_ok
            out["screen_correct"] = bool(scr_err < 5e-3 and argmax_ok)
            log(f"screening leg: max rel err {scr_err:.2e}, "
                f"argmax match {argmax_ok}")
            flush()

            # adjoint leg (26q: the four-plane sweep plus two complex
            # carriers stays well under HBM): streamed reverse adjoint
            # gradients vs d/dtheta of the dressed closed form
            if N <= 26:
                from qsfh_tpu.engine.pallas_kernels import (
                    adjoint_stream_pallas,
                    apply_stream_pallas,
                )

                ones = np.ones_like(rth)

                @jax.jit
                def sweep():
                    re, im = build()
                    fre, fim = rotation_stream_planes(
                        re, im, N, xb, zb, rth, phre, phim
                    )
                    psi_f = (fre + 1j * fim).reshape(-1).astype(jnp.complex64)
                    lam = apply_stream_pallas(psi_f, N, xs, zs, cre32, cim32)
                    _, _, contribs = adjoint_stream_pallas(
                        psi_f, lam, N,
                        xb[::-1], zb[::-1],
                        jnp.asarray(rth[::-1]), jnp.asarray(ones[::-1]),
                        jnp.asarray(phre[::-1]), jnp.asarray(phim[::-1]),
                    )
                    return contribs

                grads_dev = 2.0 * np.asarray(sweep())[::-1]
                h = 1e-5
                grads_fd = np.empty(len(rots))
                for t_i in range(len(rots)):
                    def e_at(dt, _t=t_i):
                        shifted = [
                            (rx, rz, rt + (dt if k == _t else 0.0))
                            for k, (rx, rz, rt) in enumerate(rots)
                        ]
                        return product_expectation(
                            rotated_hamiltonian(p.qubit_hamiltonian, shifted),
                            N, th, al,
                        )
                    grads_fd[t_i] = (e_at(h) - e_at(-h)) / (2 * h)
                g_scale = max(float(np.abs(grads_fd).max()), 1e-9)
                adj_err = float(np.abs(grads_dev - grads_fd).max()) / g_scale
                out["adjoint_grads_on_device"] = [float(g) for g in grads_dev]
                out["adjoint_grads_closed_form"] = [float(g) for g in grads_fd]
                out["adjoint_max_rel_err"] = adj_err
                out["adjoint_correct"] = bool(adj_err < 5e-3)
                log(f"adjoint leg: max rel err {adj_err:.2e}")
                flush()

        plane_bytes = 2 * (1 << N) * 4  # re+im f32
        from qsfh_tpu.engine.pallas_kernels import _stream_groups
        groups = _stream_groups(xs, 11 if N >= 19 else (N - 8))
        out["n_groups"] = len(groups)
        model = 2 * plane_bytes * len(groups)  # conj + partner reads per group
        out["model_bytes_per_eval"] = int(model)
        if out["eval_marginal_ms"] > 0:
            out["model_GBps"] = round(model / (out["eval_marginal_ms"] / 1e3) / 1e9, 1)
        log(f"fetch-synced {out['eval_fetch_synced_ms']} ms, "
            f"marginal {out['eval_marginal_ms']} ms over {len(groups)} groups")

    flush()
    print("tpu_stream_big:", json.dumps(out))
    return 0 if (out["correct"] and out.get("rot_correct", True)) else 1


if __name__ == "__main__":
    sys.exit(main())
