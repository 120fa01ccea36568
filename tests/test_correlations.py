"""Static correlators and structure factors (ops/correlations.py)."""

import numpy as np
import pytest

from qsfh_tpu.algos.base import HubbardProblem
from qsfh_tpu.engine.state import basis_state
from qsfh_tpu.ops.correlations import (
    correlation_matrix,
    momentum_distribution,
    one_body_density_matrix,
    pair_correlation_matrix,
    site_number_operator,
    site_spin_z,
    spin_spin_operator,
    structure_factor,
)
from qsfh_tpu.ops.fermion import FermionOperator, hermitian_conjugated, normal_ordered
from qsfh_tpu.ops.jw import jordan_wigner
from qsfh_tpu.utils.dense import paulisum_to_dense


@pytest.fixture(scope="module")
def gs_2x2():
    p = HubbardProblem(2, 2, 1.0, 6.0, 4, 2, 2, results_root="results")
    e0, gs = p.ground_state()
    return p, np.asarray(gs)


def test_spin_operator_identities():
    # S_i.S_i on a singly-occupied site has eigenvalue s(s+1) = 3/4:
    # check as an operator statement on the 1-site doublet states
    op = spin_spin_operator(0, 0)
    dense = paulisum_to_dense(jordan_wigner(op), 2)
    # basis |q0 q1> = |up dn>: |10> (up only) and |01> (dn only)
    assert dense[2, 2].real == pytest.approx(0.75)
    assert dense[1, 1].real == pytest.approx(0.75)
    # empty and doubly-occupied sites carry no spin
    assert dense[0, 0].real == pytest.approx(0.0)
    assert dense[3, 3].real == pytest.approx(0.0)
    # hermiticity of the correlator operator
    ss = spin_spin_operator(0, 1)
    assert normal_ordered(hermitian_conjugated(ss)).isclose(normal_ordered(ss))


def test_afm_ground_state_correlations(gs_2x2):
    """Half-filled 2x2 at U=6: antiferromagnetic sign structure, exact
    S(0,0) = 0 in the Sz=0 sector, structure factor peaked at (pi,pi),
    and the sum rule (1/N) sum_q S(q) = <S_i.S_i>."""
    p, gs = gs_2x2
    c = correlation_matrix(gs, 4, kind="spin")
    np.testing.assert_allclose(c, c.T, atol=1e-12)
    assert c[0, 1] < 0 and c[0, 2] < 0  # nearest neighbours anti-aligned
    assert c[0, 3] > 0                  # diagonal aligned
    s = structure_factor(c, 2, 2)
    assert s[(0, 0)] == pytest.approx(0.0, abs=1e-10)  # total Sz=S=0
    assert s[(1, 1)] == max(s.values())
    np.testing.assert_allclose(
        sum(s.values()) / 4, np.mean(np.diag(c)), atol=1e-10
    )


def test_correlation_matrix_matches_dense(gs_2x2):
    p, gs = gs_2x2
    op = spin_spin_operator(0, 2)
    dense = paulisum_to_dense(jordan_wigner(op), 8)
    expected = np.vdot(gs, dense @ gs).real
    c = correlation_matrix(gs, 4, kind="spin")
    assert c[0, 2] == pytest.approx(expected, abs=1e-10)


def test_one_body_density_matrix_matches_dense(gs_2x2):
    p, gs = gs_2x2
    rho = one_body_density_matrix(gs, 4, spin="up")
    np.testing.assert_allclose(rho, rho.conj().T, atol=1e-10)
    assert np.trace(rho).real == pytest.approx(2.0, abs=1e-10)  # 2 up electrons
    op = FermionOperator(((2 * 0 + 0, 1), (2 * 2 + 0, 0)))  # c^dag_{0,up} c_{2,up}
    dense = paulisum_to_dense(jordan_wigner(op), 8)
    expected = complex(np.vdot(gs, dense @ gs))
    assert rho[0, 2] == pytest.approx(expected, abs=1e-10)


def test_momentum_distribution_free_fermion():
    """U=0, one electron per spin on 2x2: the unique single-particle ground
    state sits at k=(0,0), so n(k) is exactly the one-hot occupation."""
    p = HubbardProblem(2, 2, 1.0, 0.0, 2, 1, 1, results_root="results")
    _, gs = p.ground_state()
    rho = one_body_density_matrix(np.asarray(gs), 4, spin="up")
    nk = momentum_distribution(rho, 2, 2)
    assert nk[(0, 0)] == pytest.approx(1.0, abs=1e-8)
    for k in [(0, 1), (1, 0), (1, 1)]:
        assert nk[k] == pytest.approx(0.0, abs=1e-8)


def test_momentum_distribution_convention():
    """A particle prepared in the k=(1,0) plane wave has n(k)=delta_{k,(1,0)}
    under the c_k = N^{-1/2} sum_j e^{-i k.r_j} c_j convention."""
    n_sites, nx, ny = 4, 2, 2
    xs = np.arange(n_sites) % nx
    psi = sum(
        np.exp(2j * np.pi * 1 * xs[j] / nx) * np.asarray(basis_state(8, [2 * j]))
        for j in range(n_sites)
    ) / 2.0
    rho = one_body_density_matrix(psi, n_sites, spin="up")
    nk = momentum_distribution(rho, nx, ny)
    assert nk[(1, 0)] == pytest.approx(1.0, abs=1e-10)
    assert sum(nk.values()) == pytest.approx(1.0, abs=1e-10)


def test_pair_correlation_matrix(gs_2x2):
    p, gs = gs_2x2
    pair = pair_correlation_matrix(gs, 4)
    np.testing.assert_allclose(pair, pair.conj().T, atol=1e-10)
    # diagonal = double occupancy: positive, suppressed by U=6 below the
    # uncorrelated value <n_up><n_dn> = 1/4
    for i in range(4):
        assert 0.0 < pair[i, i].real < 0.25
    # dense cross-check of one off-diagonal entry
    op = FermionOperator(((0, 1), (1, 1), (5, 0), (4, 0)))  # Delta^dag_0 Delta_2
    dense = paulisum_to_dense(jordan_wigner(op), 8)
    expected = complex(np.vdot(gs, dense @ gs))
    assert pair[0, 2] == pytest.approx(expected, abs=1e-10)
    # eigenvalues of a Hermitian positive-semidefinite correlator
    assert np.linalg.eigvalsh(pair).min() > -1e-10


def test_connected_density_correlations(gs_2x2):
    p, gs = gs_2x2
    c = correlation_matrix(gs, 4, kind="density", connected=True)
    # on-site connected density fluctuation is positive; total density is
    # pinned (N=4), so every row sums to ~0
    assert all(c[i, i] > 0 for i in range(4))
    np.testing.assert_allclose(c.sum(axis=1), 0.0, atol=1e-10)
