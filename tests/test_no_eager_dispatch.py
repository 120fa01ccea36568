"""Library init must dispatch ZERO device programs.

The tunneled TPU compile service caches compile FAILURES by program hash.
Any unsalted fixed-hash program dispatched at import/constructor time
(dtype probes, eager parameter arrays, optimizer init) can be poisoned by
one sick service window and then kills every later real-model process —
the round-2 root cause of all on-chip rejections (BASELINE.md, "The
on-chip train step").  This guard re-runs the forensic check that found
it: JAX_LOG_COMPILES across import -> ADAPT ctor -> _build_step must show
no compilations.  Reference driver being protected: the reference
constructs its models eagerly on the accelerator
(/root/reference/models/adapt_vqe.py:70-140) — a luxury a failure-caching
remote compile service does not allow.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, %(repo)r)

from qsfh_tpu.algos.adapt import ADAPT

print("PHASE_CTOR", file=sys.stderr, flush=True)
vqe = ADAPT(
    n_epoch=0, threshold1=1e-2, threshold2=1e-2, x_dimension=2,
    y_dimension=2, n_electrons=4, n_spin_up=2, n_spin_down=2,
    tunneling=1.0, coulomb=6.0, ground_truth=False, plot=False,
    log_metrics=False, circuit_mode="split",
)
import optax
raw = vqe._build_step(tuple(range(4)), optax.adam(1e-2)).raw_stages
print("PHASE_DONE", file=sys.stderr, flush=True)
"""


@pytest.mark.slow
def test_import_ctor_build_dispatch_free():
    env = dict(os.environ)
    env["JAX_LOG_COMPILES"] = "1"
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT % {"repo": REPO}],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "PHASE_DONE" in proc.stderr
    compiles = [
        line for line in proc.stderr.splitlines() if "Compiling jit" in line
    ]
    assert not compiles, (
        "library init dispatched device programs (poisonable fixed hashes "
        "on failure-caching compile services):\n" + "\n".join(compiles)
    )


def test_default_matmul_precision_is_highest():
    """MXU default f32 matmuls truncate to bf16; the package must pin
    'highest' (measured 1.6e-2 permutation corruption otherwise,
    benchmarks/tpu_op_probe.jsonl)."""
    import jax

    import qsfh_tpu  # noqa: F401  (import sets the config)

    assert jax.config.jax_default_matmul_precision == "highest"
