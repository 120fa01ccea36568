"""Fused multi-iteration train step == sequential per-stage dispatches.

benchmarks/tpu_step_fused.py composes ADAPT's raw split stages into one
lax.scan-over-iterations program (the on-chip measurement shape).  This
pins that composition to the dispatch-per-stage step() path: same
energies, gradients norms, and final parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax import lax

from qsfh_tpu.algos.adapt import ADAPT


@pytest.fixture(scope="module")
def vqe():
    return ADAPT(
        n_epoch=0, threshold1=1e-2, threshold2=1e-2,
        x_dimension=2, y_dimension=2, n_electrons=4,
        n_spin_up=2, n_spin_down=2, tunneling=1.0, coulomb=4.0,
        ground_truth=False, plot=False, log_metrics=False,
        circuit_mode="split",
    )


def test_fused_scan_matches_sequential_steps(vqe):
    indices = tuple(range(4))
    optimizer = optax.adam(1e-2)
    step = vqe._build_step(indices, optimizer)
    raw = step.raw_stages

    th0 = jnp.full(4, 0.05, dtype=vqe._rdt)
    opt0 = optimizer.init(th0)

    # sequential: the production step() (separately jitted stages)
    th, opt = th0, opt0
    seq_e, seq_gn = [], []
    for _ in range(3):
        th, opt, e, sz, s2, fid, gn = step(th, opt)
        seq_e.append(float(e))
        seq_gn.append(float(gn))
    th_seq = np.asarray(th)

    # fused: ONE jitted scan over the same three iterations
    def one_step(carry, _):
        t, o = carry
        psi_r = raw["fwd"](t)
        e = raw["energy"](psi_r)
        lam_r = raw["cotangent"](psi_r)
        g = raw["adjoint"](psi_r, lam_r, t)
        sz, s2, fid = raw["metrics"](psi_r)
        t, o, gn = raw["update"](t, g, o)
        return (t, o), (e, gn)

    @jax.jit
    def multi(t, o):
        (t, o), traj = lax.scan(one_step, (t, o), None, length=3)
        return t, traj

    th_fused, (es, gns) = multi(th0, opt0)

    np.testing.assert_allclose(np.asarray(es), seq_e, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gns), seq_gn, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(th_fused), th_seq, rtol=1e-6, atol=1e-9)


def test_fwd_from_matches_fwd(vqe):
    """fwd_from (host-fed |psi0>) == fwd (traced basis_state): benchmarks
    feed the initial state as an input because tracing the basis one-hot
    costs the remote compile service ~2 min at 18q."""
    from qsfh_tpu.engine.state import bitpos

    indices = tuple(range(4))
    raw = vqe._build_step(indices, optax.adam(1e-2)).raw_stages
    th = jnp.asarray([0.1, -0.2, 0.3, 0.05], vqe._rdt)
    index = 0
    for q in vqe._occupied_modes:
        index |= 1 << bitpos(q, vqe.n_qubits)
    arr = np.zeros((2, 1 << vqe.n_qubits), np.asarray(th).dtype)
    arr[0, index] = 1.0
    a = np.asarray(raw["fwd"](th))
    b = np.asarray(raw["fwd_from"](jnp.asarray(arr), th))
    np.testing.assert_array_equal(a, b)


def test_program_salt_is_numerically_invisible(vqe):
    # the per-stage salt constant (salt * 1e-30) must not move any result
    # beyond float roundoff
    indices = tuple(range(3))
    optimizer = optax.adam(1e-2)
    salted = ADAPT(
        n_epoch=0, threshold1=1e-2, threshold2=1e-2,
        x_dimension=2, y_dimension=2, n_electrons=4,
        n_spin_up=2, n_spin_down=2, tunneling=1.0, coulomb=4.0,
        ground_truth=False, plot=False, log_metrics=False,
        circuit_mode="split", program_salt=3.7e-5,
    )
    th = jnp.full(3, 0.05, dtype=vqe._rdt)
    s_plain = vqe._build_step(indices, optimizer)
    s_salted = salted._build_step(indices, optimizer)
    _, _, e0, sz0, s20, _, gn0 = s_plain(th, optimizer.init(th))
    _, _, e1, sz1, s21, _, gn1 = s_salted(th, optimizer.init(th))
    # the salt appends a tiny static rotation (angle 3.7e-5) to the Givens
    # network and adds 1e-35-scale constants: effects stay below 1e-4
    assert abs(float(e0) - float(e1)) < 1e-4
    assert abs(float(gn0) - float(gn1)) < 1e-4
    assert abs(float(sz0) - float(sz1)) < 1e-4
