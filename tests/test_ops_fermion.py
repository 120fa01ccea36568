"""Unit tests: fermionic ladder algebra, JW transform, and an independent
first-quantized ED cross-check of the whole operator stack."""

import itertools

import numpy as np
import pytest

from qsfh_tpu.ops.fermion import (
    FermionOperator,
    hermitian_conjugated,
    normal_ordered,
    number_operator,
)
from qsfh_tpu.ops.jw import jordan_wigner
from qsfh_tpu.ops.lattice import fermi_hubbard, spin_operator
from qsfh_tpu.ops.tools import get_interacting_term, get_quadratic_term
from qsfh_tpu.utils.dense import paulisum_to_dense


# ---- independent fermionic ED (occupation-number basis, explicit signs) ----


def ladder_apply(det: int, mode: int, dagger: int, n_modes: int):
    """Apply a_mode / a^dag_mode to determinant `det` (bit p = mode p occupied).

    Sign convention: a^dag_p |det> = (-1)^{#occ modes < p} |det + p>, matching
    JW with Z strings on modes below p.
    """
    bit = 1 << mode
    occupied = bool(det & bit)
    if dagger and occupied:
        return None
    if not dagger and not occupied:
        return None
    sign = (-1) ** bin(det & (bit - 1)).count("1")
    return det ^ bit, sign


def fermion_dense(op: FermionOperator, n_modes: int) -> np.ndarray:
    """Dense matrix in the statevector index convention (mode 0 = MSB)."""
    dim = 1 << n_modes
    H = np.zeros((dim, dim), dtype=complex)

    def det_to_index(det):
        # mode p occupied -> bit (n_modes-1-p) of the index
        idx = 0
        for p in range(n_modes):
            if (det >> p) & 1:
                idx |= 1 << (n_modes - 1 - p)
        return idx

    for term, coeff in op.terms.items():
        for det in range(dim):
            cur, sign = det, 1
            ok = True
            for mode, dagger in reversed(term):
                r = ladder_apply(cur, mode, dagger, n_modes)
                if r is None:
                    ok = False
                    break
                cur, s = r
                sign *= s
            if ok:
                H[det_to_index(cur), det_to_index(det)] += coeff * sign
    return H


# ---- normal ordering --------------------------------------------------------


def test_normal_order_ccr():
    # a_0 a^_0 = 1 - a^_0 a_0
    op = FermionOperator("0 0^")
    no = normal_ordered(op)
    expected = FermionOperator.identity() - FermionOperator("0^ 0")
    assert no == expected


def test_normal_order_anticommute():
    op = FermionOperator("0^ 1^")
    no = normal_ordered(op)
    assert no == FermionOperator("1^ 0^", -1.0)
    # nilpotency
    assert len(normal_ordered(FermionOperator("1^ 1^")).terms) == 0
    assert len(normal_ordered(FermionOperator("2 2")).terms) == 0


def test_normal_order_matches_dense():
    rng = np.random.default_rng(0)
    n = 4
    op = FermionOperator.zero()
    op += FermionOperator("2^ 0^ 3 1", 1.3 - 0.2j)
    op += FermionOperator("1 0^", 0.7)
    op += FermionOperator("3 2^ 1^ 0", -0.4j)
    no = normal_ordered(op)
    assert np.allclose(fermion_dense(op, n), fermion_dense(no, n))


def test_hermitian_conjugated():
    op = FermionOperator("2^ 0", 1.0 + 2.0j)
    hc = hermitian_conjugated(op)
    assert np.allclose(fermion_dense(hc, 3), fermion_dense(op, 3).conj().T)


# ---- Jordan-Wigner ----------------------------------------------------------


def test_jw_single_mode():
    terms = dict(jordan_wigner(FermionOperator("0^")).to_terms())
    assert terms["X0"] == pytest.approx(0.5)
    assert terms["Y0"] == pytest.approx(-0.5j)
    terms = dict(jordan_wigner(FermionOperator("0")).to_terms())
    assert terms["Y0"] == pytest.approx(0.5j)


def test_jw_number_operator():
    # n_p = (1 - Z_p)/2
    terms = dict(jordan_wigner(number_operator(3, 1)).to_terms())
    assert terms[""] == pytest.approx(0.5)
    assert terms["Z1"] == pytest.approx(-0.5)


def test_jw_z_string():
    terms = dict(jordan_wigner(FermionOperator("2^")).to_terms())
    assert terms["Z0 Z1 X2"] == pytest.approx(0.5)
    assert terms["Z0 Z1 Y2"] == pytest.approx(-0.5j)


@pytest.mark.parametrize(
    "op,n",
    [
        (FermionOperator("0^ 1"), 2),
        (FermionOperator("1^ 0", 1j) - FermionOperator("0^ 1", 1j), 2),
        (FermionOperator("3^ 0^ 2 1", 0.37), 4),
        (FermionOperator("2^ 2"), 3),
        (FermionOperator("0^ 1^ 3 2", 1j) - FermionOperator("3^ 2^ 0 1", 1j), 4),
    ],
)
def test_jw_matches_fermion_dense(op, n):
    """JW matrix == independent first-quantized fermionic matrix."""
    assert np.allclose(paulisum_to_dense(jordan_wigner(op), n), fermion_dense(op, n))


# ---- Hubbard lattice builder -------------------------------------------------


def sector_indices(n_qubits, n_electrons, n_up):
    """Statevector indices of fixed (N, N_up), reference bit convention."""
    out = []
    for occ in itertools.combinations(range(n_qubits), n_electrons):
        if sum(1 for p in occ if p % 2 == 0) == n_up:
            out.append(sum(1 << (n_qubits - 1 - p) for p in occ))
    return sorted(out)


def test_two_site_hubbard_analytic():
    """1x2 Hubbard, 2 electrons, Sz=0: E0 = (U - sqrt(U^2 + 16 t^2)) / 2."""
    t, U = 1.0, 4.0
    H = fermi_hubbard(2, 1, t, U, periodic=True)
    Hd = paulisum_to_dense(jordan_wigner(H), 4)
    idx = sector_indices(4, 2, 1)
    sector = Hd[np.ix_(idx, idx)]
    e0 = np.linalg.eigvalsh(sector)[0]
    assert e0 == pytest.approx((U - np.sqrt(U**2 + 16 * t**2)) / 2, abs=1e-10)


def test_two_site_no_double_bond():
    """Periodic wrap in a 2-site direction must not double the bond."""
    H = fermi_hubbard(2, 1, 1.0, 0.0, periodic=True)
    quad = get_quadratic_term(H)
    # single bond, both spins, both directions: 4 hopping terms, coeff -1
    assert len(quad.terms) == 4
    assert all(c == pytest.approx(-1.0) for c in quad.terms.values())


def test_hubbard_2x2_term_structure():
    H = fermi_hubbard(2, 2, 1.0, 6.0, periodic=True)
    quad = get_quadratic_term(H)
    inter = get_interacting_term(H)
    # 4 edges x 2 spins x 2 directions = 16 hopping terms
    assert len(quad.terms) == 16
    # 4 on-site U terms
    assert len(inter.terms) == 4
    assert all(c == pytest.approx(6.0) for c in inter.terms.values())


def test_hubbard_hermitian_and_symmetries():
    H = fermi_hubbard(2, 2, 1.0, 6.0, periodic=True)
    n = 8
    Hd = paulisum_to_dense(jordan_wigner(H), n)
    assert np.allclose(Hd, Hd.conj().T)
    # H commutes with N and Sz
    from qsfh_tpu.ops.lattice import particle_number_operator

    Nd = paulisum_to_dense(jordan_wigner(particle_number_operator(2, 2)), n)
    Szd = paulisum_to_dense(jordan_wigner(spin_operator(4, "Sz")), n)
    assert np.allclose(Hd @ Nd, Nd @ Hd)
    assert np.allclose(Hd @ Szd, Szd @ Hd)


def test_hubbard_matches_independent_ed():
    """Full stack (lattice -> JW -> dense) == first-quantized fermionic ED."""
    H = fermi_hubbard(2, 2, 1.0, 6.0, periodic=True)
    assert np.allclose(paulisum_to_dense(jordan_wigner(H), 8), fermion_dense(H, 8))


def test_spin_operators_algebra():
    """[Sx, Sy] = i Sz and S^2 eigenvalues are s(s+1)."""
    n_sites = 2
    n = 4
    Sx = paulisum_to_dense(jordan_wigner(spin_operator(n_sites, "Sx")), n)
    Sy = paulisum_to_dense(jordan_wigner(spin_operator(n_sites, "Sy")), n)
    Sz = paulisum_to_dense(jordan_wigner(spin_operator(n_sites, "Sz")), n)
    S2 = paulisum_to_dense(jordan_wigner(spin_operator(n_sites, "S^2")), n)
    assert np.allclose(Sx @ Sy - Sy @ Sx, 1j * Sz)
    assert np.allclose(S2, Sx @ Sx + Sy @ Sy + Sz @ Sz)
    evs = np.linalg.eigvalsh(S2)
    allowed = {0.0, 0.75, 2.0}
    assert all(any(abs(e - a) < 1e-9 for a in allowed) for e in evs)
