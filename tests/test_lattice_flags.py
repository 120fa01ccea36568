"""Golden tests for the fermi_hubbard builder's secondary flags.

The spinful default path is golden-tested elsewhere
(tests/test_fourier_givens.py, tests/test_ops_fermion.py); these pin the
``spinless`` and ``particle_hole_symmetry`` flags the reference exposes
through OpenFermion's builder (SURVEY.md section 2.2, reference usage
``models/hva.py:147-153``).
"""

import numpy as np

from qsfh_tpu.linalg.exact import get_sparse_operator
from qsfh_tpu.ops.jw import jordan_wigner
from qsfh_tpu.ops.lattice import fermi_hubbard


def _dense(H, n_qubits):
    return get_sparse_operator(jordan_wigner(H), n_qubits).toarray()


def test_spinless_two_site_hand_matrix():
    """2-site spinless chain: H = -t(c0^+ c1 + h.c.) + U n0 n1, by hand.

    Occupation basis |n1 n0> (qubit 0 = site 0, big-endian index n1*2+n0):
    states {00, 01, 10, 11}."""
    t, U = 1.3, 3.7
    M = _dense(fermi_hubbard(2, 1, t, U, periodic=True, spinless=True), 2)
    expect = np.zeros((4, 4), dtype=complex)
    expect[1, 2] = expect[2, 1] = -t  # c0^+ c1 between |10> and |01|
    expect[3, 3] = U
    np.testing.assert_allclose(M, expect, atol=1e-12)


def test_spinless_particle_hole_shift():
    """PHS subtracts 1/2 from each density: on the 2-site chain
    U(n0-1/2)(n1-1/2) = U n0 n1 - U(n0+n1)/2 + U/4 exactly."""
    t, U = 1.0, 4.0
    M_plain = _dense(fermi_hubbard(2, 1, t, U, periodic=True, spinless=True), 2)
    M_phs = _dense(
        fermi_hubbard(2, 1, t, U, periodic=True, spinless=True,
                      particle_hole_symmetry=True), 2
    )
    n_tot = np.diag([0.0, 1.0, 1.0, 2.0])
    np.testing.assert_allclose(
        M_phs, M_plain - U / 2 * n_tot + U / 4 * np.eye(4), atol=1e-12
    )


def test_spinful_particle_hole_sector_spectrum():
    """Spinful PHS on 2x2: U(nu-1/2)(nd-1/2) per site, so every eigenvalue
    in a fixed-N sector shifts by -U*N/2 + U*n_sites/4."""
    U = 6.0
    n_qubits, n_sites = 8, 4
    H = fermi_hubbard(2, 2, 1.0, U)
    H_phs = fermi_hubbard(2, 2, 1.0, U, particle_hole_symmetry=True)
    A = _dense(H, n_qubits)
    B = _dense(H_phs, n_qubits)
    # restrict both to the (N=4, N_up=2) sector via occupation masks
    occ = np.array([bin(i).count("1") for i in range(1 << n_qubits)])
    up = np.array(
        [bin(i & 0b01010101).count("1") for i in range(1 << n_qubits)]
    )
    idx = np.where((occ == 4) & (up == 2))[0]
    ev_a = np.linalg.eigvalsh(A[np.ix_(idx, idx)])
    ev_b = np.linalg.eigvalsh(B[np.ix_(idx, idx)])
    shift = -U * 4 / 2 + U * n_sites / 4
    np.testing.assert_allclose(ev_b, ev_a + shift, atol=1e-10)


def test_spinless_magnetic_field_is_noop_and_mu():
    """chemical_potential enters as -mu * n_i for every spinless site;
    magnetic_field has no spin to couple to and must be a no-op
    (OpenFermion's spinless fermi_hubbard ignores it)."""
    t, U, mu = 1.0, 0.0, 0.9
    M0 = _dense(fermi_hubbard(2, 1, t, U, periodic=True, spinless=True), 2)
    M1 = _dense(
        fermi_hubbard(2, 1, t, U, periodic=True, spinless=True,
                      chemical_potential=mu), 2
    )
    n_tot = np.diag([0.0, 1.0, 1.0, 2.0])
    np.testing.assert_allclose(M1, M0 - mu * n_tot, atol=1e-12)

    Mb = _dense(
        fermi_hubbard(2, 1, t, U, periodic=True, spinless=True,
                      magnetic_field=0.7), 2
    )
    np.testing.assert_array_equal(Mb, M0)
