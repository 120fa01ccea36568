#!/usr/bin/env python
"""Regenerate BASELINE.md's headline table from the artifacts themselves.

Round-3 and round-4 verdicts both flagged hand-edited headline rows that
had gone stale against the artifacts (a pointer-less "29.417 live", a
"0.0456 mHa at epoch 53" row outlived by anchors.jsonl).  This script is
the fix: every number in the generated block is read from a named artifact
file at generation time, and the block is rewritten in place between
HTML-comment markers.  Run it before any round-closing commit:

    python benchmarks/regen_baseline.py

Rows whose artifact is missing are emitted as "(artifact missing)" rather
than carried forward -- a stale number cannot survive a regen.
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.normpath(os.path.join(HERE, ".."))
BASELINE = os.path.join(ROOT, "BASELINE.md")
BEGIN = "<!-- BEGIN GENERATED HEADLINE (benchmarks/regen_baseline.py) -->"
END = "<!-- END GENERATED HEADLINE -->"


def _jload(relpath):
    p = os.path.join(ROOT, relpath)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as fh:
            return json.load(fh)
    except Exception:
        return None


def _jsonl_last(relpath):
    p = os.path.join(ROOT, relpath)
    if not os.path.exists(p):
        return None
    last = None
    with open(p) as fh:
        for line in fh:
            line = line.strip()
            if line:
                last = line
    try:
        return json.loads(last) if last else None
    except Exception:
        return None


def _jsonl_best(relpath, key="E"):
    p = os.path.join(ROOT, relpath)
    if not os.path.exists(p):
        return None
    best = None
    with open(p) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except Exception:
                continue
            if key in rec and (best is None or rec[key] < best[key]):
                best = rec
    return best


def rows():
    out = []

    def row(quantity, value, source):
        out.append((quantity, value, source))

    # -- flagship convergence (anchors.jsonl is the f64 authority) --------
    a = _jsonl_last("benchmarks/demo_3x3/anchors.jsonl")
    if a:
        row(
            "Flagship 3x3 ADAPT gap (f64 anchor)",
            f"**{1e3 * a['gap_ha']:.4f} mHa** at epoch {a['epoch']} "
            f"({a['n_params']} params, fidelity {a['fidelity_f64']:.7f}, "
            f"gnorm {a['grad_norm_f64']:.1e})",
            f"`demo_3x3/anchors.jsonl` tail ({a['time']})",
        )
    else:
        row("Flagship 3x3 ADAPT gap", "(artifact missing)",
            "`demo_3x3/anchors.jsonl`")

    for tag, path in (
        ("L-BFGS f64 polish", "benchmarks/demo_3x3/polish_cpu64.jsonl"),
        ("Newton-CG f64 polish", "benchmarks/demo_3x3/polish_newton.jsonl"),
        ("native-engine f64 polish", "benchmarks/demo_3x3/polish_fast.jsonl"),
    ):
        b = _jsonl_best(path)
        if b:
            row(
                f"Flagship {tag} best",
                f"{b['gap_mHa']:.4f} mHa (eval {b['eval']}, "
                f"gnorm {b['gnorm']:.1e})",
                f"`{os.path.relpath(path, 'benchmarks')}` best-E record",
            )

    # -- variational-floor certificate (round 5) -------------------------
    fh_ = _jload("benchmarks/demo_3x3/floor_hessian.json")
    fc = _jload("benchmarks/demo_3x3/floor_certificate.json")
    if fh_:
        ritz = fh_.get("min_ritz")
        dec = fh_.get("newton_decrement_uHa")
        gap = fh_.get("gap_uHa", float("nan"))
        if dec:
            # the CG decrement is a LOWER bound on remaining descent; with
            # the measured increment ratio straddling 1 (see FLOOR.md) the
            # only certified statements are the bound pair below
            val = (f"min Ritz **{ritz:+.3f}** (convex basin); measured "
                   f"remaining descent **>= {dec:.1f} uHa** at "
                   f"{fh_.get('cg_iters', '?')} CG iters -> floor <= "
                   f"{gap - dec:.1f} uHa, open below (see "
                   f"demo_3x3/FLOOR.md)")
        else:
            val = (f"gap {gap:.1f} uHa, min Ritz {ritz:+.3f} "
                   f"({fh_.get('status', '?')})")
        row("Flagship 1719-op variational floor (Hessian certificate)",
            val, "`demo_3x3/floor_hessian.json` + `FLOOR.md`")

    # -- train-step benchmark --------------------------------------------
    t = _jload("benchmarks/tpu_result.json")
    if t:
        row(
            "On-chip 18q ADAPT train step",
            f"**{t['value']} iters/sec** (vs_baseline {t['vs_baseline']}x)",
            f"`tpu_result.json` (recorded_at {t.get('recorded_at', '?')}, "
            f"git_rev {t.get('git_rev', '?')})",
        )
    else:
        row("On-chip 18q ADAPT train step", "(artifact missing)",
            "`tpu_result.json`")

    for nq in (22, 24):
        t = _jload(f"benchmarks/tpu_result_{nq}q.json")
        if t:
            row(
                f"On-chip {nq}q ADAPT train step",
                f"{t['value']} iters/sec (vs_baseline {t['vs_baseline']}x)",
                f"`tpu_result_{nq}q.json`",
            )

    # -- flagship-scale step adjoint-route A/B (round 5) -----------------
    c = _jload("benchmarks/demo_3x3/step_chain_ab.json")
    if c and c.get("best_route"):
        best = c[c["best_route"]]
        xla = (c.get("xla") or {}).get("ms_per_iter")
        xs = f" vs {xla:.0f} ms XLA-scan" if xla else ""
        chain_note = (" (chain class rejected by compile helper)"
                      if c.get("chain_blocked") else "")
        row(
            f"Flagship-scale step ({c.get('n_ops', '?')} ops), "
            f"{c['best_route']} adjoint",
            f"**{best['ms_per_iter']:.0f} ms/iter**{xs}"
            f" (grad abs parity {best.get('grad_max_abs_err', float('nan')):.1e}"
            f" vs f64 = the f32 state floor at the converged point)"
            f"{chain_note}",
            "`demo_3x3/step_chain_ab.json`",
        )

    # -- streaming ladder ------------------------------------------------
    for nq in (24, 26, 28, 30):
        s = _jload(f"benchmarks/tpu_stream_big_{nq}.json")
        if not s:
            continue
        fused = s.get("fused_static_marginal_ms")
        grouped = s.get("eval_marginal_ms")
        best = fused if fused else grouped
        if best is None:
            continue
        kind = "fused-static" if fused else "grouped"
        rel = s.get("energy_rel_err")
        extra = f", energy rel err {rel:.1e}" if rel is not None else ""
        row(
            f"{nq}q streaming energy eval",
            f"{best:.2f} ms {kind}{extra}",
            f"`tpu_stream_big_{nq}.json`",
        )

    # -- screening -------------------------------------------------------
    sc = _jload("benchmarks/tpu_screen_24.json")
    if sc and sc.get("screen_sweep_ms"):
        chunks = sc.get("screen_chunk_marginal_ms") or []
        spread = (f", chunk spread {min(chunks):.0f}-{max(chunks):.0f} ms"
                  f" over {sc.get('screen_chunks', len(chunks))} chunks"
                  if chunks else "")
        row(
            "24q on-chip pool screening",
            f"{sc['pool_generators']}-generator sweep "
            f"{sc['screen_sweep_ms'] / 1e3:.2f} s{spread} "
            f"(max rel err {sc['screen_max_rel_err']:.1e}, argmax "
            f"{'match' if sc.get('screen_argmax_match') else 'MISMATCH'})",
            "`tpu_screen_24.json`",
        )

    # -- adjoint chain kernel -------------------------------------------
    adj = _jload("benchmarks/tpu_adj18.json")
    if adj and adj.get("t8192_ms_median"):
        row(
            "18q adjoint chain, T=8192 terms",
            f"{adj['t8192_ms_median']:.0f} ms warm "
            f"({adj.get('t8192_per_term_us', 0):.1f} us/term)",
            "`tpu_adj18.json`",
        )

    # -- test profile ----------------------------------------------------
    tp = _jload("benchmarks/test_profile.json")
    if tp:
        row(
            "Fast test profile (solo, chip-exclusive)",
            f"{tp.get('passed', '?')} passed in "
            f"**{tp.get('wall_s', 0):.0f} s**",
            f"`test_profile.json` (recorded {tp.get('recorded_at', '?')})",
        )

    return out


def main():
    table = ["| Quantity | Value | Source artifact |", "|---|---|---|"]
    for q, v, s in rows():
        table.append(f"| {q} | {v} | {s} |")
    block = "\n".join(
        [BEGIN,
         "",
         "## Headline numbers (regenerated from artifacts)",
         "",
         "This table is the AUTHORITY for current numbers; the per-round",
         "sections below are historical narrative.  Regenerate with",
         "`python benchmarks/regen_baseline.py` -- do not hand-edit.",
         "",
         ] + table + ["", END]
    )
    src = open(BASELINE).read()
    if BEGIN in src and END in src:
        pre = src.split(BEGIN)[0]
        post = src.split(END, 1)[1]
        out = pre + block + post
    else:
        # first run: insert after the targets section, before round-1
        marker = "## Measured numbers (round 1)"
        if marker in src:
            pre, post = src.split(marker, 1)
            out = pre + block + "\n\n" + marker + post
        else:
            out = src.rstrip() + "\n\n" + block + "\n"
    with open(BASELINE, "w") as fh:
        fh.write(out)
    print(f"BASELINE.md regenerated: {len(rows())} headline rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
