"""The shared fused-step measurement protocol (benchmarks/fused_harness.py).

The accelerator branch (expected-trace config gate, parity gate, marginal
timing, vs_baseline ratio) never runs on CPU in production -- it is
exercised here with a faked platform and a deterministic run_chain so a
bug cannot waste a healthy TPU window.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"
))
from fused_harness import measure_fused_step  # noqa: E402

CONFIG = {"nx": 2, "ny": 2, "k1": 1, "k2": 3}


class _FakeDev:
    platform = "faketpu"

    def __str__(self):
        return "FakeTPU_0"


def _fake_devices(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "devices", lambda *a, **k: [_FakeDev()])


def _chain(times, energies, gnorms):
    calls = {"n": 0}

    def run_chain(k):
        calls["n"] += 1
        e = np.asarray(energies[:k], dtype=np.float32)
        g = np.asarray(gnorms[:k], dtype=np.float32)
        return times[k], e, g

    return run_chain


def _run(tmp_path, monkeypatch, trace, *, times=None, energies=None,
         gnorms=None, config=CONFIG, vs_baseline=None):
    _fake_devices(monkeypatch)
    expected = tmp_path / "expected.json"
    result = tmp_path / "result.json"
    if trace is not None:
        expected.write_text(json.dumps(trace))
    rc = measure_fused_step(
        name="t",
        run_chain=_chain(times or {1: 0.1, 3: 0.3},
                         energies or [1.0, 0.9, 0.8],
                         gnorms or [3.0, 2.5, 2.0]),
        k1=1, k2=3, config=config,
        expected_path=str(expected), result_path=str(result),
        metric="m", how="h", vs_baseline=vs_baseline,
    )
    blob = json.loads(result.read_text()) if result.exists() else None
    return rc, blob


def _good_trace():
    return {"config": CONFIG, "energies": [1.0, 0.9, 0.8],
            "gnorms": [3.0, 2.5, 2.0]}


def test_records_marginal_and_baseline_ratio(tmp_path, monkeypatch):
    rc, blob = _run(tmp_path, monkeypatch, _good_trace(),
                    times={1: 0.1, 3: 0.3}, vs_baseline=50.0)
    assert rc == 0
    # marginal = (0.3 - 0.1) / 2 = 0.1 s/iter -> 10 iters/s, 500x baseline
    assert blob["value"] == pytest.approx(10.0)
    assert blob["vs_baseline"] == pytest.approx(500.0)
    assert blob["platform"] == "FakeTPU_0"


def test_refuses_mismatched_config(tmp_path, monkeypatch):
    trace = _good_trace()
    trace["config"] = {**CONFIG, "k2": 6}
    rc, blob = _run(tmp_path, monkeypatch, trace)
    assert rc == 1 and blob is None


def test_refuses_shape_mismatch_on_legacy_trace(tmp_path, monkeypatch):
    # pre-config traces (no "config" key) are accepted but shape-guarded
    rc, blob = _run(tmp_path, monkeypatch,
                    {"energies": [1.0] * 6, "gnorms": [3.0] * 6})
    assert rc == 1 and blob is None


def test_refuses_parity_failure(tmp_path, monkeypatch):
    trace = _good_trace()
    trace["energies"] = [2.0, 1.8, 1.6]  # wrong numbers
    rc, blob = _run(tmp_path, monkeypatch, trace)
    assert rc == 1 and blob is None


def test_refuses_missing_trace(tmp_path, monkeypatch):
    rc, blob = _run(tmp_path, monkeypatch, None)
    assert rc == 1 and blob is None


def test_cpu_writes_trace_with_config(tmp_path, monkeypatch):
    import jax

    monkeypatch.setenv("QSFH_PROFILE_ALLOW_CPU", "1")
    # real platform here is cpu (conftest); no device fake
    expected = tmp_path / "expected.json"
    result = tmp_path / "result.json"
    rc = measure_fused_step(
        name="t", run_chain=_chain({1: 0.1, 3: 0.3},
                                   [1.0, 0.9, 0.8], [3.0, 2.5, 2.0]),
        k1=1, k2=3, config=CONFIG,
        expected_path=str(expected), result_path=str(result),
        metric="m", how="h", vs_baseline=None,
    )
    assert rc == 0
    trace = json.loads(expected.read_text())
    assert trace["config"] == CONFIG
    assert trace["energies"] == pytest.approx([1.0, 0.9, 0.8])
    assert not result.exists()  # CPU results go to /tmp, never recorded
