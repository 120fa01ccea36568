"""Entanglement diagnostics (ops/entanglement.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from qsfh_tpu.algos.base import HubbardProblem
from qsfh_tpu.engine.state import basis_state
from qsfh_tpu.ops.entanglement import (
    entanglement_entropy,
    mutual_information,
    reduced_density_matrix,
    renyi_entropy,
    site_qubits,
)


def bell_on_0_2():
    """(|000> + |101>)/sqrt(2): qubits 0 and 2 maximally entangled, qubit 1
    in |0> (flat bits: qubit 0 most significant)."""
    psi = np.zeros(8, dtype=complex)
    psi[0b000] = psi[0b101] = 1 / np.sqrt(2)
    return psi


def test_product_state_has_zero_entropy():
    psi = basis_state(4, (0, 2), dtype=jnp.complex128)
    for keep in [(0,), (1, 2), (0, 1, 2, 3)]:
        assert entanglement_entropy(psi, 4, keep) == pytest.approx(0.0, abs=1e-12)


def test_bell_pair_entropies():
    psi = bell_on_0_2()
    assert entanglement_entropy(psi, 3, (0,), base=2) == pytest.approx(1.0)
    assert entanglement_entropy(psi, 3, (2,), base=2) == pytest.approx(1.0)
    assert entanglement_entropy(psi, 3, (1,), base=2) == pytest.approx(0.0, abs=1e-12)
    # complementary subsystems share the Schmidt spectrum
    assert entanglement_entropy(psi, 3, (0, 2)) == pytest.approx(0.0, abs=1e-12)
    assert entanglement_entropy(psi, 3, (0, 1), base=2) == pytest.approx(1.0)
    # maximally mixed marginal: every Renyi order gives log 2
    for alpha in (0.5, 2.0, 3.0):
        assert renyi_entropy(psi, 3, (0,), alpha, base=2) == pytest.approx(1.0)
    assert mutual_information(psi, 3, (0,), (2,), base=2) == pytest.approx(2.0)


def test_reduced_density_matrix_matches_einsum():
    rng = np.random.default_rng(7)
    psi = rng.normal(size=32) + 1j * rng.normal(size=32)
    psi /= np.linalg.norm(psi)
    rho = reduced_density_matrix(psi, 5, (1, 3))
    t = psi.reshape((2,) * 5)
    expected = np.einsum("abcde,axcye->bdxy", t, t.conj()).reshape(4, 4)
    np.testing.assert_allclose(rho, expected, atol=1e-12)
    assert np.trace(rho).real == pytest.approx(1.0)
    assert np.linalg.eigvalsh(rho).min() > -1e-12


def test_renyi_ordering_and_validation():
    rng = np.random.default_rng(3)
    psi = rng.normal(size=16) + 1j * rng.normal(size=16)
    psi /= np.linalg.norm(psi)
    s1 = entanglement_entropy(psi, 4, (0, 1))
    s2 = renyi_entropy(psi, 4, (0, 1), alpha=2.0)
    assert s2 <= s1 + 1e-12  # Renyi decreasing in alpha
    assert renyi_entropy(psi, 4, (0, 1), alpha=1.0) == pytest.approx(s1)
    with pytest.raises(ValueError):
        renyi_entropy(psi, 4, (0, 1), alpha=-1.0)
    with pytest.raises(ValueError):
        mutual_information(psi, 4, (0, 1), (1, 2))
    with pytest.raises(ValueError):
        entanglement_entropy(psi, 4, (0, 0))


def test_hubbard_ground_state_entanglement():
    p = HubbardProblem(2, 2, 1.0, 6.0, 4, 2, 2, results_root="results")
    _, gs = p.ground_state()
    assert site_qubits((0, 1)) == (0, 1, 2, 3)
    s_site = entanglement_entropy(gs, 8, site_qubits((0,)))
    assert s_site > 0.1  # interacting ground state is entangled
    i_diag = mutual_information(gs, 8, site_qubits((0,)), site_qubits((3,)))
    assert i_diag > 0.0
    # pure total state: S(A) = S(complement)
    assert entanglement_entropy(gs, 8, site_qubits((0, 1))) == pytest.approx(
        entanglement_entropy(gs, 8, site_qubits((2, 3))), abs=1e-10
    )
