"""HVA raw split stages compose into one fused program == production step.

Mirrors tests/test_fused_step.py for the HVA trainer: the per-stage
closures exposed as step.raw_stages (the on-chip measurement surface for
benchmarks/tpu_step_hva.py) must reproduce the dispatch-per-stage step()
exactly, and fwd_from (host-fed |psi0>) must equal fwd.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax import lax

from qsfh_tpu.algos.hva import HVA, flatten_hva_params


@pytest.fixture(scope="module")
def vqe(tmp_path_factory):
    return HVA(
        n_epoch=0, reps=2, lr=1e-2,
        x_dimension=2, y_dimension=2, n_electrons=4,
        n_spin_up=2, n_spin_down=2, tunneling=1.0, coulomb=4.0,
        ground_truth=False, plot=False, log_metrics=False,
        circuit_mode="split",
        results_root=str(tmp_path_factory.mktemp("hva_fused")),
    )


def _nonzero_params(vqe, seed=7):
    rng = np.random.default_rng(seed)
    rdt = np.asarray(vqe.params["theta_U"]).dtype
    return {
        k: jnp.asarray(rng.normal(0, 0.1, v.shape).astype(rdt))
        for k, v in vqe.params.items()
    }


def test_fused_scan_matches_sequential_steps(vqe):
    raw = vqe._step.raw_stages
    params0 = _nonzero_params(vqe)
    opt0 = vqe.optimizer.init(params0)

    # sequential: the production step() (separately jitted stages)
    params, opt = params0, opt0
    seq_e, seq_gn = [], []
    for _ in range(3):
        params, opt, e, sz, s2, fid, gn = vqe._step(params, opt)
        seq_e.append(float(e))
        seq_gn.append(float(gn))
    flat_seq = np.asarray(flatten_hva_params(params))

    # fused: ONE jitted scan over the same three iterations
    def one_step(carry, _):
        p, o = carry
        flat = flatten_hva_params(p)
        psi_r = raw["fwd"](flat)
        e = raw["energy"](psi_r)
        lam_r = raw["cotangent"](psi_r)
        g = raw["adjoint"](psi_r, lam_r, flat)
        sz, s2, fid = raw["metrics"](psi_r)
        p, o, gn = raw["update"](flat, g, p, o)
        return (p, o), (e, gn)

    @jax.jit
    def multi(p, o):
        (p, o), traj = lax.scan(one_step, (p, o), None, length=3)
        return p, traj

    p_fused, (es, gns) = multi(params0, opt0)

    np.testing.assert_allclose(np.asarray(es), seq_e, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gns), seq_gn, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(flatten_hva_params(p_fused)), flat_seq, rtol=1e-6, atol=1e-9
    )


def test_fwd_from_matches_fwd(vqe):
    raw = vqe._step.raw_stages
    flat = jnp.asarray(flatten_hva_params(_nonzero_params(vqe, seed=3)))
    a = np.asarray(raw["fwd"](flat))
    b = np.asarray(raw["fwd_from"](jnp.asarray(vqe._psi0_reim), flat))
    np.testing.assert_array_equal(a, b)
