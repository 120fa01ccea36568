#!/usr/bin/env python
"""Flagship-scale (1719-op, 18q) on-chip train-step A/B across adjoint routes.

VERDICT r4 next #3: "flip the chain adjoint into production at 18q and
re-measure the flagship step" (the round-4 in-flight run pinned
QSFH_PALLAS_ADJ_MAX_N=17; tpu_adj18.json showed the chain at T=8192 in
274 ms).  On 2026-08-21 ~04:49Z the remote compile helper REGRESSED and
now crashes on the adjoint-chain program class (HTTP 500, subprocess
exit 1, all T, fresh salts, healthy windows -- see
tpu_adj_chain_probe.jsonl), so this harness measures every route that
compiles and records the chain attempt's outcome honestly:

  chain   -- QSFH_PALLAS_ADJ_MAX_N unset (default 18, VMEM chain kernel)
  stream  -- QSFH_PALLAS_ADJ_MAX_N=17  (HBM-streaming adjoint kernel)
  xla     -- QSFH_PALLAS_ADJ_MAX_N=9   (grouped XLA reverse scan;
             the forward/energy stages keep their pallas chains)

Each route runs in its OWN subprocess (a helper crash must not poison
the surviving routes' backend state).  Timing is marginal between 2- and
6-iteration fetch-synced loops of the stage-dispatch step (fwd + cot_e +
adjoint), the production dispatch of the flagship growth loop.  Gradient
parity is checked against the native f64 host engine
(qsfh_tpu/native/statevec64.cpp, itself parity-tested to 4e-15 against
the jax f64 stages).

Writes step_chain_ab.json; reference frame: the reference's 18q step is
torch-CPU backprop at ~252 s/iter (/root/reference/models/adapt_vqe_for_3x3.py).
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.normpath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, ROOT)

OUT = os.path.join(HERE, "step_chain_ab.json")

ROUTES = {
    "stream": {"QSFH_PALLAS_ADJ_MAX_N": "17"},
    "chain": {},
    "xla": {"QSFH_PALLAS_ADJ_MAX_N": "9"},
}


def run_route(name: str) -> dict:
    env = dict(os.environ)
    env.pop("QSFH_PALLAS_ADJ_MAX_N", None)
    env.update(ROUTES[name])
    env["QSFH_STEP_AB_ROUTE"] = name
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner"],
            env=env, timeout=900, capture_output=True, text=True,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("ROUTE_RESULT "):
                return json.loads(line.split(" ", 1)[1])
        return {
            "ok": False,
            "error": (proc.stderr.strip().splitlines() or ["no output"])[-1][-300:],
            "rc": proc.returncode,
        }
    except subprocess.TimeoutExpired:
        return {"ok": False, "error": "timeout 900s"}


def inner() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from qsfh_tpu.algos.adapt import ADAPT
    from qsfh_tpu.algos.adapt_fused import initial_state_reim
    from qsfh_tpu.ops.pool import hubbard_interaction_pool_extended

    route = os.environ["QSFH_STEP_AB_ROUTE"]
    salt = (time.time() % 86400) * 1e-9
    vqe = ADAPT(
        n_epoch=0, threshold1=1e-3, threshold2=1e-3,
        x_dimension=3, y_dimension=3, n_electrons=9, n_spin_up=5,
        n_spin_down=4, tunneling=1, coulomb=6, degenerate_subspace=4,
        pool=hubbard_interaction_pool_extended(3, 3), ground_truth=False,
        load_model=True, results_root=HERE, plot=False, log_metrics=False,
        circuit_mode="split", program_salt=salt,
    )
    indices = tuple(vqe.selected_indices)
    step = vqe._build_step(indices, optax.adam(1e-3))
    raw = step.raw_stages
    fwd = jax.jit(raw["fwd_from"])
    cot_e = jax.jit(raw["cot_e"])
    adj = jax.jit(raw["adjoint"])
    psi0_r32 = initial_state_reim(vqe)
    th32 = jnp.asarray(np.asarray(vqe.params_t, np.float32))

    def one_iter(th):
        psi_r = fwd(psi0_r32, th)
        lam_r, e = cot_e(psi_r)
        g = adj(psi_r, lam_r, th)
        return e, g

    t0 = time.time()
    e32, g32 = one_iter(th32)
    e32 = float(np.asarray(e32))
    g32 = np.asarray(g32, np.float64)
    first_call_s = time.time() - t0

    def loop(k):
        t0 = time.time()
        for _ in range(k):
            e, g = one_iter(th32)
        float(np.asarray(e)) + float(np.asarray(g)[0])  # fetch-sync
        return time.time() - t0

    loop(1)  # everything warm
    t2 = loop(2)
    t6 = loop(6)
    ms_per_iter = (t6 - t2) / 4 * 1e3

    # host-f64 parity via the native engine
    from qsfh_tpu.native.statevec import Rot64Program

    prog = Rot64Program.from_adapt(vqe)
    psi0 = psi0_r32[0].astype(np.float64) + 1j * psi0_r32[1].astype(np.float64)
    e64, g64 = prog.value_and_grad(np.asarray(th32, np.float64), psi0)
    denom = max(1e-30, float(np.max(np.abs(g64))))
    res = {
        "ok": True, "route": route, "n_ops": len(indices),
        "first_call_s": round(first_call_s, 1),
        "t2_s": round(t2, 3), "t6_s": round(t6, 3),
        "ms_per_iter": round(ms_per_iter, 1),
        "e32": e32, "e64": e64, "e_abs_err": abs(e32 - e64),
        "grad_max_abs_err": float(np.max(np.abs(g32 - g64))),
        "grad_max_rel_err": float(np.max(np.abs(g32 - g64)) / denom),
    }
    print("ROUTE_RESULT " + json.dumps(res), flush=True)
    return 0


def main() -> int:
    if "--inner" in sys.argv:
        return inner()

    import jax

    if jax.devices()[0].platform == "cpu" and not os.environ.get(
        "QSFH_PROFILE_ALLOW_CPU"
    ):
        print("step_chain_ab: no TPU; refusing to record", file=sys.stderr)
        return 1

    sys.path.insert(0, ROOT)
    import bench  # chip exclusivity guard

    result = {
        "time": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "git": os.popen(f"git -C {ROOT} rev-parse --short HEAD").read().strip(),
        "platform": str(jax.devices()[0]),
    }
    with bench._chip_exclusive():
        for name in ("stream", "chain", "xla"):
            t0 = time.time()
            r = run_route(name)
            r["wall_s"] = round(time.time() - t0, 1)
            result[name] = r
            print(f"route {name}: {json.dumps(r)[:200]}", flush=True)
            with open(OUT + ".tmp", "w") as fh:
                json.dump(result, fh, indent=1)
            os.replace(OUT + ".tmp", OUT)
    # summary fields for regen_baseline
    best = min(
        (r for r in (result.get(k) for k in ROUTES) if r and r.get("ok")),
        key=lambda r: r["ms_per_iter"], default=None,
    )
    if best:
        result["n_ops"] = best.get("n_ops")
        result["best_route"] = best["route"]
        result["chain_blocked"] = not result.get("chain", {}).get("ok", False)
        with open(OUT + ".tmp", "w") as fh:
            json.dump(result, fh, indent=1)
        os.replace(OUT + ".tmp", OUT)
    return 0


if __name__ == "__main__":
    sys.exit(main())
