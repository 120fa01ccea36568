#!/usr/bin/env python
"""Utilization analysis for the HBM-streaming expectation path (VERDICT #3).

Pure host-side reduction of the recorded on-chip artifacts
(``tpu_stream_big_{26,28,30}.json``, ``tpu_pallas.json``,
``tpu_result*.json``): derives, per state size, the bytes the streaming
kernels actually move (from the kernels' own block/group schedule -- the
same ``_stream_groups`` host partitioning that drives the BlockSpec
index maps, not an assumed passes-per-term), the achieved HBM bandwidth,
and the fraction of the v5e's 819 GB/s peak.  It also computes the
COMPUTE cost of the permutation-matmul XOR formulation, because at these
shapes the kernel is MXU-bound, not HBM-bound -- the roofline crossover
is the headline finding (see emitted JSON).

Writes benchmarks/tpu_utilization.json and prints a markdown table.
"""
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

HBM_PEAK_GBPS = 819.0  # TPU v5e (v5 lite) HBM bandwidth
# f32 matmul at Precision.HIGHEST runs the bf16x6 passes path on the MXU;
# public v5e peak is 197 TFLOPS bf16 -> ~1/6 for exact f32
MXU_F32_HIGHEST_TFLOPS = 197.0 / 6.0
LANE = 128

SIZES = {
    22: ("1x11", "tpu_stream_big_22.json"),
    24: ("2x6", "tpu_stream_big_24.json"),
    26: ("1x13", "tpu_stream_big_26.json"),
    28: ("2x7", "tpu_stream_big_28.json"),
    30: ("3x5", "tpu_stream_big_30.json"),
}


def lattice_terms(nx, ny):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from qsfh_tpu.ops.jw import jordan_wigner
    from qsfh_tpu.ops.lattice import fermi_hubbard
    from qsfh_tpu.engine.state import qmask_to_bmask

    H = jordan_wigner(fermi_hubbard(nx, ny, 1.0, 6.0, periodic=True))
    n = 2 * nx * ny
    xs = np.array([qmask_to_bmask(int(x), n) for x in H.x], np.uint32)
    return H, n, xs


def stream_schedule(n, xs, static: bool):
    """Reproduce the streaming kernels' block/group partitioning, using
    the kernels' OWN block-rows policy (static kernels run 256-row
    blocks since the separable-weights rework; dynamic run 2048)."""
    import os as _os

    from qsfh_tpu.engine.pallas_kernels import (
        _stream_block_rows,
        _stream_groups,
    )

    prev = _os.environ.get("QSFH_STREAM_STATIC")
    _os.environ["QSFH_STREAM_STATIC"] = "1" if static else "0"
    try:
        rows = (1 << n) // LANE
        br = _stream_block_rows(rows)
    finally:
        if prev is None:
            _os.environ.pop("QSFH_STREAM_STATIC", None)
        else:
            _os.environ["QSFH_STREAM_STATIC"] = prev
    bb = br.bit_length() - 1
    groups = _stream_groups(xs, bb)
    nb = rows // br
    return groups, bb, nb


def static_schedule_cost(n, xs, bb):
    """MXU flops of the STATIC-mask kernels for one eval.

    Static kernels dedupe permutes by distinct (group, in-block flip):
    one 128x128 lane matmul per distinct xlo WITH lane bits (2*128
    flops/element/plane), one (8,8) sublane matmul when row bits 0-2 are
    set (2*8), and zero flops for the aligned high-row-bit swaps (pure
    copies).  Per-TERM work is VPU sign/weight accumulation, not MXU.
    """
    from qsfh_tpu.engine.pallas_kernels import _stream_groups

    groups = _stream_groups(xs, bb)
    inb = (1 << (7 + bb)) - 1
    flops = 0
    n_el = 1 << n
    for _, idx in groups.items():
        xlos = {int(xs[t]) & inb for t in idx}
        for xlo in xlos:
            if xlo & (LANE - 1):
                flops += 2 * n_el * 2 * LANE  # lane matmul, both planes
            if (xlo >> 7) & 7:
                flops += 2 * n_el * 2 * 8  # sublane (8,8) matmul
    return flops


def analyze(n, lattice, path):
    blob = json.load(open(os.path.join(HERE, path)))
    nx, ny = (int(v) for v in lattice.split("x"))
    H, n2, xs = lattice_terms(nx, ny)
    assert n2 == n
    groups, bb, nb = stream_schedule(n, xs, bool(blob.get("stream_static")))
    G = len(groups)
    T = len(xs)
    plane_pair = 2 * (1 << n) * 4  # re+im f32 bytes

    ms = blob.get("eval_marginal_ms") or blob.get("eval_fetch_synced_ms")
    below_noise = ms is not None and ms <= 0.5
    if below_noise:
        # chained-call marginal smaller than tunnel RTT jitter (the 22q
        # eval): the fetch-synced number is an upper bound, so derived
        # bandwidth columns are lower bounds -- flagged in the row
        ms = blob.get("eval_fetch_synced_ms")
    secs = ms / 1e3

    # grouped kernel traffic: per group, conj (re,im) + partner (re,im)
    bytes_grouped = 2 * plane_pair * G
    # fused kernel (grid (block, group), group innermost): conj resident,
    # partners re-read per group -> (1 + G) plane-pair reads
    bytes_fused = plane_pair * (1 + G)

    # compute cost of the DYNAMIC XOR-permute-as-matmul formulation:
    # per term, per plane, every (rows, 128) element goes through THREE
    # permutation matmuls; the 128x128 lane matmul dominates -> 2*128
    # flops per element per plane (MACs counted as 2 flops)
    flops_permute = T * 2 * (1 << n) * 2 * LANE
    t_mxu = flops_permute / (MXU_F32_HIGHEST_TFLOPS * 1e12)
    t_hbm = bytes_grouped / (HBM_PEAK_GBPS * 1e9)
    flops_static = static_schedule_cost(n, xs, bb)
    t_mxu_static = flops_static / (MXU_F32_HIGHEST_TFLOPS * 1e12)

    row = {
        "n_qubits": n,
        "lattice": lattice,
        "h_terms": T,
        "stream_groups": G,
        "stream_static": blob.get("stream_static"),
        "state_bytes": plane_pair,
        "measured_ms_per_eval": ms,
        "marginal_below_tunnel_noise": below_noise or None,
        "bytes_moved_grouped": int(bytes_grouped),
        "achieved_GBps": round(bytes_grouped / secs / 1e9, 1),
        "pct_hbm_peak": round(100 * bytes_grouped / secs / 1e9 / HBM_PEAK_GBPS, 1),
        "permute_matmul_tflop": round(flops_permute / 1e12, 2),
        "static_permute_tflop": round(flops_static / 1e12, 2),
        "mxu_bound_ms_at_peak": round(t_mxu * 1e3, 1),
        "static_mxu_bound_ms_at_peak": round(t_mxu_static * 1e3, 1),
        "hbm_bound_ms_at_peak": round(t_hbm * 1e3, 1),
        "bound": (
            ("HBM" if t_hbm > t_mxu_static else "MXU (static permutes)")
            if blob.get("stream_static")
            else ("MXU (permute matmuls)" if t_mxu > t_hbm else "HBM")
        ),
        # measured-to-roofline gap of the run this row reports: >1 means
        # the kernel is not yet at its own model's ceiling (pipeline
        # serialization / VPU per-term weight planes are the suspects)
        "measured_over_roofline_x": round(
            (ms / 1e3)
            / max(t_hbm, t_mxu_static if blob.get("stream_static") else t_mxu),
            1,
        ),
        "fused_bytes_per_eval": int(bytes_fused),
        "fused_measured_ms": blob.get("fused_marginal_ms"),
    }
    # round-4 fused-static route (production default since expectation.py
    # routes here): one pallas call per <=16 groups, conj side read once
    # per call and the xh==0 group served from the conj refs, roll+select
    # permutes (VPU) instead of MXU matmuls
    fs_ms = blob.get("fused_static_marginal_ms")
    if fs_ms is not None and fs_ms <= 0.5:
        # marginal below tunnel RTT jitter (22q/24q: the whole eval is
        # faster than the timing noise): record the measurement, skip the
        # nonsense-bandwidth derivation
        row["fused_static_measured_ms"] = fs_ms
        row["fused_static_marginal_below_tunnel_noise"] = True
        fs_ms = None
    if fs_ms:
        from qsfh_tpu.engine.pallas_kernels import _fused_static_group_cap

        gcap = _fused_static_group_cap()
        calls = max(1, -(-G // gcap))
        g_partner = G - (1 if 0 in groups else 0)
        bytes_fs = plane_pair * (calls + g_partner)
        row["fused_static_measured_ms"] = fs_ms
        row["fused_static_bytes_per_eval"] = int(bytes_fs)
        row["fused_static_GBps"] = round(bytes_fs / (fs_ms / 1e3) / 1e9, 1)
        row["fused_static_pct_hbm_peak"] = round(
            100 * row["fused_static_GBps"] / HBM_PEAK_GBPS, 1
        )
        peak_path = os.path.join(HERE, "tpu_hbm_peak.json")
        if os.path.exists(peak_path):
            meas_peak = json.load(open(peak_path)).get("sum_f32_GBps")
            if meas_peak:
                row["fused_static_pct_measured_peak"] = round(
                    100 * row["fused_static_GBps"] / meas_peak, 1
                )
    # round-2 dynamic-kernel runs of the same sizes (preserved as *_r2.json)
    # give the measured A/B column for the round-3 static-mask kernels
    for suffix in ("_r2.json", "_dyn.json"):
        dyn = os.path.join(HERE, path.replace(".json", suffix))
        if os.path.exists(dyn) and os.path.getsize(dyn):
            db = json.load(open(dyn))
            dms = db.get("eval_marginal_ms") or db.get("eval_fetch_synced_ms")
            if dms and blob.get("stream_static"):
                row["dynamic_ms_per_eval"] = dms
                row["static_speedup_x"] = round(dms / ms, 2)
            break
    return row


def main():
    rows = []
    for n, (lattice, path) in SIZES.items():
        if os.path.exists(os.path.join(HERE, path)):
            rows.append(analyze(n, lattice, path))

    # 18q from the pallas chain artifact (state VMEM-resident: the chain
    # kernel reads the planes once per 256-term chunk)
    pallas = os.path.join(HERE, "tpu_pallas.json")
    if os.path.exists(pallas):
        pb = json.load(open(pallas))
        ms = pb.get("energy_eval_chain_ms")
        if ms:
            n = 18
            plane_pair = 2 * (1 << n) * 4
            H, _, xs = lattice_terms(3, 3)
            rows.insert(
                0,
                {
                    "n_qubits": 18,
                    "lattice": "3x3",
                    "h_terms": len(xs),
                    "stream_groups": None,
                    "state_bytes": plane_pair,
                    "measured_ms_per_eval": ms,
                    "bytes_moved_grouped": 2 * plane_pair,
                    "achieved_GBps": round(2 * plane_pair / (ms / 1e3) / 1e9, 1),
                    "pct_hbm_peak": round(
                        100 * 2 * plane_pair / (ms / 1e3) / 1e9 / HBM_PEAK_GBPS, 1
                    ),
                    "bound": "VMEM-resident (chain)",
                },
            )

    peak_path = os.path.join(HERE, "tpu_hbm_peak.json")
    measured_peak = None
    if os.path.exists(peak_path):
        measured_peak = json.load(open(peak_path)).get("sum_f32_GBps")
    out = {
        "hbm_peak_GBps": HBM_PEAK_GBPS,
        # what a plain bandwidth-bound XLA reduction actually sustains on
        # THIS chip (tpu_hbm_peak.py) -- the honest achievable ceiling
        "measured_achievable_GBps": measured_peak,
        "mxu_f32_highest_tflops": MXU_F32_HIGHEST_TFLOPS,
        "note": (
            "bytes_moved derives from the kernels' real block/group "
            "schedule (_stream_groups), not assumed passes-per-term. "
            "Round-2 finding: the DYNAMIC kernels are MXU-bound on the "
            "XOR permutation matmuls (4-6% of HBM peak).  Round-3 static-"
            "mask kernels cut permute flops ~10x (dedupe by distinct "
            "in-block flip; lane matmul only when lane bits set; sublane "
            "swaps as copies), flipping every streaming size to "
            "HBM-bound per the static_mxu_bound vs hbm_bound columns; "
            "measured A/B lands in dynamic_ms_per_eval/static_speedup_x "
            "when the campaign records both artifacts"
        ),
        "sizes": rows,
    }
    with open(os.path.join(HERE, "tpu_utilization.json"), "w") as f:
        json.dump(out, f, indent=1)

    cols = [
        "n_qubits", "h_terms", "stream_groups", "measured_ms_per_eval",
        "dynamic_ms_per_eval", "static_speedup_x",
        "achieved_GBps", "pct_hbm_peak", "mxu_bound_ms_at_peak",
        "static_mxu_bound_ms_at_peak", "hbm_bound_ms_at_peak", "bound",
    ]
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in rows:
        print("| " + " | ".join(str(r.get(c, "")) for c in cols) + " |")


if __name__ == "__main__":
    main()
