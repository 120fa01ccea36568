"""Engine tests: fused gates and expectations against dense linear algebra."""

import numpy as np
import pytest
import scipy.linalg

import jax.numpy as jnp

from qsfh_tpu.engine import gates
from qsfh_tpu.engine.expectation import (
    Observable,
    PackedPool,
    apply_paulisum,
    diagonal_weight_vector,
    expectation,
)
from qsfh_tpu.engine.state import basis_state, zero_state
from qsfh_tpu.ops.fermion import FermionOperator
from qsfh_tpu.ops.jw import jordan_wigner
from qsfh_tpu.ops.lattice import fermi_hubbard, spin_operator
from qsfh_tpu.ops.pauli import PauliSum, qubit_operator
from qsfh_tpu.utils.dense import paulisum_to_dense


def random_state(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    v /= np.linalg.norm(v)
    return jnp.asarray(v)


def test_basis_state_index():
    psi = np.asarray(basis_state(3, [0, 2]))
    # qubit 0 -> bit 2, qubit 2 -> bit 0  => index 0b101 = 5
    assert psi[5] == 1.0 and np.sum(np.abs(psi)) == 1.0


@pytest.mark.parametrize("term", ["X0", "Z1", "Y2", "X0 Z1 Y2", "Y0 Y3", "Z0 Z2"])
def test_apply_pauli_string(term):
    n = 4
    p = qubit_operator(term)
    x, z = int(p.x[0]), int(p.z[0])
    psi = random_state(n)
    out = gates.apply_pauli_string(psi, n, x, z)
    expected = paulisum_to_dense(p, n) @ np.asarray(psi)
    assert np.allclose(np.asarray(out), expected)


@pytest.mark.parametrize("term", ["X0 X1", "Y0 Z1 Y2", "Z0 Z3", "X2"])
def test_pauli_rotation_vs_expm(term):
    n = 4
    theta = 0.731
    p = qubit_operator(term)
    x, z = int(p.x[0]), int(p.z[0])
    psi = random_state(n, seed=1)
    out = gates.pauli_rotation(psi, n, x, z, theta)
    P = paulisum_to_dense(p, n)
    expected = scipy.linalg.expm(-1j * theta * P) @ np.asarray(psi)
    assert np.allclose(np.asarray(out), expected, atol=1e-12)


def test_generator_rotation_coulomb_diagonal_equivalence():
    """A diagonal generator rotation == precomputed diagonal_rotation."""
    H = fermi_hubbard(2, 2, 1.0, 6.0)
    from qsfh_tpu.ops.tools import get_interacting_term

    U_term = jordan_wigner(get_interacting_term(H))
    n = 8
    theta = 0.3
    psi = random_state(n, seed=2)
    out1 = gates.generator_rotation(psi, n, U_term.rotation_terms(), theta)
    # the constant (identity) part only contributes a global phase; compare via
    # the diagonal weight vector which includes it
    D = diagonal_weight_vector(U_term, n)
    out2 = gates.diagonal_rotation(psi, D, theta)
    # remove global phase from identity component
    const = U_term.constant().real
    out1 = np.asarray(out1) * np.exp(-1j * theta * const)
    assert np.allclose(out1, np.asarray(out2), atol=1e-12)


def test_one_and_two_qubit_gates():
    n = 3
    psi = random_state(n, seed=3)
    H2 = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
    out = gates.apply_one_qubit(psi, n, H2, 1)
    expected = np.kron(np.kron(np.eye(2), H2), np.eye(2)) @ np.asarray(psi)
    assert np.allclose(np.asarray(out), expected)

    cx = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]])
    out = gates.cnot(psi, n, 0, 2)
    expected_mat = np.zeros((8, 8))
    for b in range(8):
        ctrl = (b >> 2) & 1
        target_flipped = b ^ (1 if ctrl else 0)
        expected_mat[target_flipped, b] = 1
    assert np.allclose(np.asarray(out), expected_mat @ np.asarray(psi))
    # reversed order control/target
    out = gates.cnot(psi, n, 2, 0)
    expected_mat = np.zeros((8, 8))
    for b in range(8):
        ctrl = b & 1
        flipped = b ^ (4 if ctrl else 0)
        expected_mat[flipped, b] = 1
    assert np.allclose(np.asarray(out), expected_mat @ np.asarray(psi))


def test_rz_convention():
    n = 2
    psi = random_state(n, seed=4)
    phi = 0.42
    out = gates.rz(psi, n, phi, 1)
    D = np.kron(np.eye(2), np.diag([np.exp(-1j * phi / 2), np.exp(1j * phi / 2)]))
    assert np.allclose(np.asarray(out), D @ np.asarray(psi))


def test_single_excitation_matrix():
    n = 2
    phi = 1.234
    psi = random_state(n, seed=5)
    out = gates.single_excitation(psi, n, phi, 0, 1)
    c, s = np.cos(phi / 2), np.sin(phi / 2)
    U = np.array([[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]])
    assert np.allclose(np.asarray(out), U @ np.asarray(psi))
    # swapped wires: basis reordering
    out_sw = gates.single_excitation(psi, n, phi, 1, 0)
    P = np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]])
    assert np.allclose(np.asarray(out_sw), P @ U @ P @ np.asarray(psi))


def test_expectation_and_apply_vs_dense():
    H = fermi_hubbard(2, 2, 1.0, 6.0)
    hp = jordan_wigner(H)
    n = 8
    psi = random_state(n, seed=6)
    Hd = paulisum_to_dense(hp, n)
    e = expectation(psi, n, hp)
    expected = np.real(np.asarray(psi).conj() @ Hd @ np.asarray(psi))
    assert float(e) == pytest.approx(expected, abs=1e-10)
    out = apply_paulisum(psi, n, hp)
    assert np.allclose(np.asarray(out), Hd @ np.asarray(psi), atol=1e-10)


def test_observable_large_group_path():
    """Force the vmapped/scanned large-sum path and compare to dense."""
    import qsfh_tpu.engine.expectation as expect_mod

    old = expect_mod._VMAP_THRESHOLD
    expect_mod._VMAP_THRESHOLD = 1
    try:
        sp = jordan_wigner(spin_operator(4, "S^2"))
        n = 8
        psi = random_state(n, seed=7)
        obs = Observable(sp, n)
        e = obs.expectation(psi)
        Sd = paulisum_to_dense(sp, n)
        assert float(e) == pytest.approx(
            np.real(np.asarray(psi).conj() @ Sd @ np.asarray(psi)), abs=1e-10
        )
    finally:
        expect_mod._VMAP_THRESHOLD = old


def test_pool_screening_matches_dense_commutator():
    """grad_k = 2 Im <w|G_k psi> == d/de <psi| e^{ieG} H e^{-ieG} |psi> at e=0."""
    n = 4
    rng = np.random.default_rng(8)
    H = jordan_wigner(fermi_hubbard(2, 1, 1.0, 4.0))
    Hd = paulisum_to_dense(H, n)
    gens = [
        jordan_wigner(
            FermionOperator("2^ 0", 1j) - FermionOperator("0^ 2", 1j)
        ),
        jordan_wigner(
            FermionOperator("3^ 1", 1j) - FermionOperator("1^ 3", 1j)
        ),
        jordan_wigner(
            FermionOperator("2^ 3^ 1 0", 1j) - FermionOperator("1^ 0^ 2 3", 1j)
        ),
    ]
    psi = random_state(n, seed=9)
    w = jnp.asarray(Hd @ np.asarray(psi))
    pool = PackedPool(gens, n)
    grads = np.asarray(pool.screen(psi, w))
    for k, g in enumerate(gens):
        Gd = paulisum_to_dense(g, n)
        # d/de <psi|e^{ieG} H e^{-ieG}|psi> = i<psi|[G,H]... with exp(-ieG) applied:
        expected = 2 * np.imag(np.asarray(psi).conj() @ Hd @ Gd @ np.asarray(psi))
        assert grads[k] == pytest.approx(expected, abs=1e-10)
