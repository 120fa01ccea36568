#!/usr/bin/env python
"""Geometric extrapolation of the Newton-decrement series -> variational
floor certificate with error bars.

Reads floor_hessian.json (written incrementally by floor_hessian.py).
The capped-CG Newton decrement d_k = (1/2) g^T p_k is monotone
non-decreasing in CG iteration k and converges to (1/2) g^T H^+ g — the
total energy descent available to ANY optimizer inside the quadratic
basin.  Against this Hessian's clustered ill-conditioned spectrum the
per-block increments decay ~geometrically once CG is into the tail, so

    D_inf ≈ d_K + Δ_K · r/(1-r),   r = tail increment ratio.

Error bars: r is estimated over every tail window of 3 consecutive
increments; the min/max r over windows give the optimistic/pessimistic
D_inf.  The certified statement is then

    floor = gap_now − D_inf   (basin bound; valid if min Ritz ≥ 0)

with [lo, hi] from the r spread.  Writes floor_certificate.json and
prints a summary.  Methodology mirrors demo_iqcc_2x3_r4/ANALYSIS.md §2
(geometric tail-sum bound with measured ratios).
"""
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "floor_hessian.json")
OUT = os.path.join(HERE, "floor_certificate.json")


def main():
    d = json.load(open(SRC))
    series = np.asarray(d.get("decrement_series_uHa", []), float)
    if len(series) < 4:
        print(f"need >=4 decrement points, have {len(series)}")
        return 1
    gap = float(d["gap_uHa"])
    inc = np.diff(np.concatenate([[0.0], series]))
    # tail ratios over sliding windows of 3 consecutive increments
    tail = inc[max(1, len(inc) - 6):]
    ratios = []
    for j in range(len(tail) - 1):
        if tail[j] > 0 and tail[j + 1] > 0:
            ratios.append(tail[j + 1] / tail[j])
    if not ratios:
        print("increment series not positive in tail; no extrapolation")
        return 1
    r_lo, r_hi = float(np.min(ratios)), float(np.max(ratios))
    r_mid = float(np.median(ratios))
    d_last = float(series[-1])
    dk = float(inc[-1])

    def dinf(r):
        r = min(r, 0.999)
        return d_last + dk * r / (1.0 - r)

    rec = {
        "time": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "source": os.path.basename(SRC),
        "source_status": d.get("status"),
        "gap_uHa": gap,
        "gnorm": d.get("gnorm"),
        "min_ritz": d.get("min_ritz"),
        "basin_convex": (d.get("min_ritz", -1) is not None
                         and d.get("min_ritz", -1) >= 0),
        "cg_iters": d.get("cg_iters"),
        "decrement_measured_uHa": d_last,
        "tail_ratio": {"lo": r_lo, "mid": r_mid, "hi": r_hi},
        "decrement_extrapolated_uHa":
            {"lo": dinf(r_lo), "mid": dinf(r_mid), "hi": dinf(r_hi)},
        "floor_uHa": {
            # higher extrapolated decrement => lower floor
            "lo": gap - dinf(r_hi), "mid": gap - dinf(r_mid),
            "hi": gap - dinf(r_lo),
        },
        "note": ("floor = gap - extrapolated Newton decrement; valid as a "
                 "quadratic-basin bound when min Ritz >= 0.  The measured "
                 "decrement alone gives the unconditional statement: at "
                 "least decrement_measured_uHa of descent remains."),
    }
    with open(OUT + ".tmp", "w") as fh:
        json.dump(rec, fh, indent=1)
    os.replace(OUT + ".tmp", OUT)
    print(json.dumps({k: rec[k] for k in (
        "gap_uHa", "decrement_measured_uHa", "tail_ratio",
        "decrement_extrapolated_uHa", "floor_uHa", "min_ritz")}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
