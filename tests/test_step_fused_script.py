"""The benchmark script benchmarks/tpu_step_fused.py, driven as a module.

The script is env-parameterized (lattice size, ansatz length, chain
lengths) so the campaign can measure a 20-qubit (2x5) on-chip step with
the same harness that recorded the 18q flagship number.  This pins the
script's own program construction -- env parsing, OPS selection, the
zero-arg constant-baked form, and the unrolled multi-step composition --
to ADAPT's production dispatch-per-stage step() at a 2x2 size.
"""

import importlib.util
import os
import sys

import jax.numpy as jnp
import numpy as np
import optax
import pytest

SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks", "tpu_step_fused.py",
)


def _load(monkeypatch, **env):
    # isolate from ambient campaign/experiment environment
    for k in list(os.environ):
        if k.startswith("QSFH_FUSED_") or k == "QSFH_BENCH_SALT":
            monkeypatch.delenv(k, raising=False)
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    spec = importlib.util.spec_from_file_location("tpu_step_fused_test", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_default_constants_are_the_18q_flagship(monkeypatch):
    for k in ("QSFH_FUSED_NX", "QSFH_FUSED_NY", "QSFH_FUSED_ANSATZ",
              "QSFH_FUSED_K1", "QSFH_FUSED_K2", "QSFH_FUSED_OPS"):
        monkeypatch.delenv(k, raising=False)
    mod = _load(monkeypatch)
    assert (mod.NX, mod.NY, mod.N_ANSATZ, mod.K1, mod.K2) == (3, 3, 12, 2, 6)
    assert mod.OPS == tuple(range(12))
    assert mod.EXPECTED_PATH.endswith("step_fused_expected.json")
    assert mod.RESULT_NAME == "tpu_result.json"


def test_env_overrides_and_artifact_suffix(monkeypatch):
    mod = _load(
        monkeypatch,
        QSFH_FUSED_NX="2", QSFH_FUSED_NY="5", QSFH_FUSED_ANSATZ="6",
        QSFH_FUSED_K1="1", QSFH_FUSED_K2="3", QSFH_FUSED_OPS="0,2,5",
    )
    assert (mod.NX, mod.NY, mod.N_QUBITS) == (2, 5, 20)
    assert mod.OPS == (0, 2, 5)  # explicit list wins over N_ANSATZ
    assert mod.EXPECTED_PATH.endswith("step_fused_expected_20q.json")
    assert mod.RESULT_NAME == "tpu_result_20q.json"


@pytest.mark.parametrize("zeroarg", ["1", "0"])
def test_script_multi_step_matches_production_step(monkeypatch, zeroarg):
    mod = _load(
        monkeypatch,
        QSFH_FUSED_NX="2", QSFH_FUSED_NY="2", QSFH_FUSED_ANSATZ="4",
        QSFH_FUSED_K1="1", QSFH_FUSED_K2="2", QSFH_FUSED_ZEROARG=zeroarg,
    )
    progs, psi0, th0, got_zeroarg = mod.build_multi_step()
    assert got_zeroarg == (zeroarg == "1")

    dt, energies, gnorms = mod.run_chain(progs, psi0, th0, 2, got_zeroarg)
    assert energies.shape == (2,) and gnorms.shape == (2,)

    # independent reference: the production dispatch-per-stage step()
    from qsfh_tpu.algos.adapt import ADAPT

    vqe = ADAPT(
        n_epoch=0, threshold1=1e-2, threshold2=1e-2,
        x_dimension=2, y_dimension=2, n_electrons=4,
        n_spin_up=2, n_spin_down=2, tunneling=1.0, coulomb=6.0,
        ground_truth=False, plot=False, log_metrics=False,
        circuit_mode="split",
    )
    optimizer = optax.adam(1e-2)
    step = vqe._build_step(tuple(range(4)), optimizer)
    th = jnp.asarray(th0)
    opt = optimizer.init(th)
    ref_e, ref_gn = [], []
    for _ in range(2):
        th, opt, e, sz, s2, fid, gn = step(th, opt)
        ref_e.append(float(e))
        ref_gn.append(float(gn))

    np.testing.assert_allclose(energies, ref_e, rtol=1e-5)
    np.testing.assert_allclose(gnorms, ref_gn, rtol=1e-5)
