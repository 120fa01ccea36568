#!/usr/bin/env python
"""Flagship 3x3 ADAPT convergence ON THE CHIP (VERDICT round-2 #1).

Resumes the epoch-17 checkpoint (690 ops, 2.9 mHa) and drives the
tightening schedule 1e-3 -> 3e-4 -> 1e-4 with the chunked fused runner
(qsfh_tpu/algos/adapt_fused.py): K full train steps per device program,
theta/Adam state as program I/O, in-flight crash recovery every chunk.
After each epoch an asynchronous CPU-float64 re-anchor (anchor_f64.py)
records the trustworthy gap to the ED manifold in anchors.jsonl --
on-chip c64 energies have a ~5e-6 Ha noise floor at |E| ~ 5.5.

The previous continuation ran this inner loop on CPU x64 at ~34 s/iter;
the chip's recorded fused step is 42 ms/iter at 12 ops
(benchmarks/tpu_result.json), and the whole point of this script is to
stop leaving that 3 orders of magnitude on the table.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, "..", "..")
sys.path.insert(0, ROOT)

# Force the ADJOINT off the streaming-pallas route at 18q: that route
# emits one pallas_call per block-crossing rotation term, and at 727
# ansatz ops (~5k rotation terms) a K-unrolled chunk program became a
# multi-thousand-kernel HLO that traced for 75+ min without finishing
# (2026-08-19).  With stream_max < 18 the adjoint lowers to ONE XLA
# reverse scan (compiles in seconds); fwd/energy/cotangent keep the
# VMEM chain kernels (their cap is 18, independent of this knob).
os.environ.setdefault("QSFH_PALLAS_STREAM_MAX_N", "17")

import jax  # noqa: E402  (axon TPU platform; do NOT force cpu here)

import numpy as np  # noqa: E402

from qsfh_tpu.algos.adapt import ADAPT  # noqa: E402
from qsfh_tpu.algos.adapt_fused import FusedAdaptRunner  # noqa: E402

SCHEDULE = [1e-3, 3e-4, 1e-4]
EPOCHS_PER_PHASE = 60
CHUNK = int(os.environ.get("QSFH_CONT_CHUNK", "8"))
TAG = "ADAPT-3x3 (t=1, U=6, n_electrons=9, up=5, down=4)"


def trim_stale_jsonl(jsonl_path: str, keep_iters: int):
    """Drop metric lines past the checkpointed iteration count.

    A crashed (or killed) CPU continuation leaves in-flight lines the
    epoch-boundary checkpoint never saw; the on-chip rerun would append
    duplicate iteration numbers after them.
    """
    if not os.path.exists(jsonl_path):
        return
    kept, dropped = [], 0
    with open(jsonl_path) as f:
        for line in f:
            try:
                it = json.loads(line).get("iter")
            except json.JSONDecodeError:
                kept.append(line)
                continue
            if it is None or it <= keep_iters:
                kept.append(line)
            else:
                dropped += 1
    if dropped:
        with open(jsonl_path + f".stale_tail", "a") as f:
            f.write(f"# trimmed {dropped} in-flight lines past iter {keep_iters} "
                    f"at {time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())}\n")
        with open(jsonl_path, "w") as f:
            f.writelines(kept)
        print(f"trimmed {dropped} stale jsonl lines (> iter {keep_iters})")


def main():
    print("platform:", jax.devices()[0], flush=True)
    vqe = ADAPT(
        n_epoch=0, threshold1=SCHEDULE[0], threshold2=SCHEDULE[0],
        x_dimension=3, y_dimension=3, n_electrons=9, n_spin_up=5,
        n_spin_down=4, tunneling=1, coulomb=6, degenerate_subspace=4,
        load_model=True, results_root=HERE, plot=True, log_metrics=True,
        program_salt=float(os.environ.get("QSFH_BENCH_SALT", "1.7e-9")),
    )
    trim_stale_jsonl(
        os.path.join(HERE, "vqe_results", TAG + ".jsonl"),
        len(vqe.results["iteration loss"]),
    )

    def anchor(_epoch):
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "anchor_f64.py")],
            stdout=open(os.path.join(HERE, "anchor_f64.log"), "a"),
            stderr=subprocess.STDOUT,
            start_new_session=True,
        )

    runner = FusedAdaptRunner(
        vqe, chunk_iters=CHUNK, metrics_every_iter=False, on_epoch_end=anchor,
        dispatch="stages",
    )
    for phase, thr in enumerate(SCHEDULE):
        vqe.threshold1 = thr
        vqe.threshold2 = thr
        target = len(vqe.results["epoch loss"]) + EPOCHS_PER_PHASE
        print(f"=== phase {phase}: thresholds {thr:g}, epochs -> {target}",
              flush=True)
        runner.run(n_epoch=target)
        ed = vqe.ground_state_energy
        last = vqe.results["epoch loss"][-1]
        print(f"=== phase {phase} done: E {last:+.8f} vs ED {ed:+.8f} "
              f"(gap {1e3 * (last - ed):.4f} mHa; NOTE: this plain c64 readout "
              f"carries ~0.3 mHa of state-norm noise at 1000+ params -- "
              f"trust anchors.jsonl / the df Rayleigh energies instead)",
              flush=True)
    anchor(-1)
    print("SCHEDULE COMPLETE")


if __name__ == "__main__":
    main()
