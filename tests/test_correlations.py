"""Static correlators and structure factors (ops/correlations.py)."""

import numpy as np
import pytest

from qsfh_tpu.algos.base import HubbardProblem
from qsfh_tpu.ops.correlations import (
    correlation_matrix,
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


def test_connected_density_correlations(gs_2x2):
    p, gs = gs_2x2
    c = correlation_matrix(gs, 4, kind="density", connected=True)
    # on-site connected density fluctuation is positive; total density is
    # pinned (N=4), so every row sums to ~0
    assert all(c[i, i] > 0 for i in range(4))
    np.testing.assert_allclose(c.sum(axis=1), 0.0, atol=1e-10)
