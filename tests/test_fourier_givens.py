"""Fourier transform, Givens planner, HVA coloring, and Slater-prep physics."""

import numpy as np
import pytest

import jax.numpy as jnp

from qsfh_tpu.engine import gates
from qsfh_tpu.engine.circuits import (
    get_non_interacting_ground_state_indices,
    slater_prep_state,
)
from qsfh_tpu.engine.expectation import Observable
from qsfh_tpu.engine.state import basis_state, zero_state
from qsfh_tpu.ops.fourier import (
    fourier_transform,
    fourier_transform_matrix,
    inverse_fourier_transform,
)
from qsfh_tpu.ops.givens import (
    givens_decomposition_square,
    plan_mode_matrix,
    rotation_mode_matrix,
)
from qsfh_tpu.ops.hva import compile_hva_hopping_indices, get_hva_commuting_hopping_terms
from qsfh_tpu.ops.jw import jordan_wigner
from qsfh_tpu.ops.lattice import fermi_hubbard
from qsfh_tpu.ops.tools import get_quadratic_term


def random_unitary(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    q, r = np.linalg.qr(a)
    return q * (np.diag(r) / np.abs(np.diag(r)))


# ---- Fourier ----------------------------------------------------------------


@pytest.mark.parametrize("nx,ny", [(2, 2), (2, 3), (3, 3), (1, 4)])
def test_ft_matrix_unitary(nx, ny):
    F = fourier_transform_matrix(nx, ny)
    assert np.allclose(F @ F.conj().T, np.eye(2 * nx * ny), atol=1e-12)


@pytest.mark.parametrize("nx,ny", [(2, 2), (2, 3), (1, 4)])
def test_ft_diagonalizes_hopping(nx, ny):
    H = fermi_hubbard(nx, ny, 1.0, 4.0)
    quad = get_quadratic_term(H)
    kquad = fourier_transform(quad, nx, ny)
    # every term must be a number operator a^dag_k a_k
    for term, coeff in kquad.terms.items():
        assert len(term) == 2
        assert term[0][0] == term[1][0]
        assert term[0][1] == 1 and term[1][1] == 0
        assert abs(coeff.imag) < 1e-9


def test_ft_roundtrip():
    H = fermi_hubbard(2, 2, 1.0, 4.0)
    quad = get_quadratic_term(H)
    back = inverse_fourier_transform(fourier_transform(quad, 2, 2), 2, 2)
    assert quad.isclose(back, tol=1e-5)


# ---- Givens planner -----------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_givens_plan_reconstructs_random_unitary(seed):
    N = 6
    Q = random_unitary(N, seed)
    decomposition, diagonal = givens_decomposition_square(Q)
    M = plan_mode_matrix(decomposition, diagonal)
    assert np.allclose(M, Q.T, atol=1e-9)


def test_givens_plan_ft_matrix():
    Q = fourier_transform_matrix(2, 2)
    decomposition, diagonal = givens_decomposition_square(Q)
    M = plan_mode_matrix(decomposition, diagonal)
    assert np.allclose(M, Q.T, atol=1e-9)
    assert np.allclose(np.abs(diagonal), 1.0)
    # layers only contain adjacent pairs
    for layer in decomposition:
        for (i, j, _, _) in layer:
            assert j == i + 1


def test_engine_gate_mode_map_matches_planner():
    """Circuit-level single-particle action == rotation_mode_matrix."""
    n = 3
    i, j, theta, phi = 1, 2, 0.613, -1.1
    V = rotation_mode_matrix(n, i, j, theta, phi)
    for p in range(n):
        psi = basis_state(n, [p])
        out = gates.single_excitation(psi, n, 2 * theta, i, j)
        out = gates.rz(out, n, phi, j)
        out = np.asarray(out)
        expected = np.zeros(1 << n, dtype=complex)
        for q in range(n):
            expected += V[q, p] * np.asarray(basis_state(n, [q]))
        # global phase from RZ acting on |0> wires: e^{-i phi/2} unless q==j
        # handled by comparing up to the vacuum phase
        vac_phase = np.exp(-1j * phi / 2)
        assert np.allclose(out, vac_phase * expected, atol=1e-10)


# ---- HVA coloring ---------------------------------------------------------------


def test_hva_coloring_2x2():
    h, v = compile_hva_hopping_indices(2, 2, True)
    assert len(h) == 1 and len(v) == 1
    # each class covers both spins of each bond
    assert sorted(h[0]) == [(0, 2), (1, 3), (4, 6), (5, 7)]
    assert sorted(v[0]) == [(0, 4), (1, 5), (2, 6), (3, 7)]


@pytest.mark.parametrize(
    "nx,ny,periodic,nh,nv",
    [(2, 2, True, 1, 1), (3, 3, True, 3, 3), (2, 4, True, 1, 2), (4, 4, True, 2, 2), (3, 2, False, 2, 1)],
)
def test_hva_coloring_counts(nx, ny, periodic, nh, nv):
    h, v = compile_hva_hopping_indices(nx, ny, periodic)
    assert len(h) == nh and len(v) == nv
    # classes partition all hopping bonds: union == quadratic term support
    H = fermi_hubbard(nx, ny, 1.0, 0.0, periodic=periodic)
    quad_pairs = set()
    for term in get_quadratic_term(H).terms:
        a, b = term[0][0], term[1][0]
        quad_pairs.add(tuple(sorted((a, b))))
    colored = set()
    for cls in h + v:
        for pair in cls:
            p = tuple(sorted(pair))
            assert p not in colored, "bond colored twice"
            colored.add(p)
    assert colored == quad_pairs


def test_hva_generators_commute_within_class():
    hs, vs = get_hva_commuting_hopping_terms(2, 3, True)
    for gen in hs + vs:
        qg = jordan_wigner(gen)
        from qsfh_tpu.utils.dense import paulisum_to_dense

        m = paulisum_to_dense(qg, 12)
        # Hermitian
        assert np.allclose(m, m.conj().T)


# ---- Slater determinant preparation -----------------------------------------------


@pytest.mark.parametrize("nx,ny,nup,ndown", [(2, 1, 1, 1), (2, 2, 2, 2), (2, 2, 1, 1)])
def test_slater_prep_is_noninteracting_eigenstate(nx, ny, nup, ndown):
    """Prepared state must be an eigenstate of the quadratic H with the sum of
    the chosen k-mode energies -- the end-to-end validation of FT matrix +
    Givens planner + engine gate conventions."""
    n = 2 * nx * ny
    H = fermi_hubbard(nx, ny, 1.0, 4.0)
    quad = get_quadratic_term(H)
    kquad = fourier_transform(quad, nx, ny)
    up_idx, down_idx = get_non_interacting_ground_state_indices(kquad, n, nup, ndown)
    energies = {t[0][0]: c.real for t, c in kquad.terms.items()}
    e_expected = sum(energies.get(i, 0.0) for i in up_idx + down_idx)

    F = fourier_transform_matrix(nx, ny)
    decomposition, diagonal = givens_decomposition_square(F)
    psi = slater_prep_state(n, up_idx + down_idx, diagonal, decomposition)

    obs = Observable(jordan_wigner(quad), n)
    hpsi = np.asarray(obs.apply(psi))
    psi_np = np.asarray(psi)
    assert np.linalg.norm(psi_np) == pytest.approx(1.0, abs=1e-10)
    e = float(obs.expectation(psi))
    assert e == pytest.approx(e_expected, abs=1e-8)
    # eigenstate residual
    assert np.linalg.norm(hpsi - e * psi_np) < 1e-8
