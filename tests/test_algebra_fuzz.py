"""Property-based (seeded random) differential tests of the operator algebra.

The golden tests elsewhere pin hand-picked cases; these sweep random
operators against an INDEPENDENT dense construction: ladder matrices built
directly as kron products (Z-string x sigma+-) rather than through the
packed-Pauli machinery under test (ops/fermion.py, ops/jw.py, ops/pauli.py).
"""

import numpy as np
import pytest

from qsfh_tpu.ops.fermion import FermionOperator, hermitian_conjugated, normal_ordered
from qsfh_tpu.ops.jw import jordan_wigner
from qsfh_tpu.ops.pauli import PauliSum
from qsfh_tpu.utils.dense import paulisum_to_dense

N_MODES = 5

_I = np.eye(2)
_Z = np.diag([1.0, -1.0])
# mode q occupies bit (n-1-q): |index bit = 1> is occupied.  With basis
# order |0>, |1> per qubit, the annihilator on one qubit maps |1> -> |0>.
_LOWER = np.array([[0.0, 1.0], [0.0, 0.0]])  # <0|a|1> = 1


def _ladder_dense(mode: int, creation: bool, n: int) -> np.ndarray:
    """a_mode (or a†) as an explicit kron product with the JW Z string on
    lower modes -- independent of the repo's JW/packed-Pauli code."""
    ops = []
    for q in range(n):  # q = 0 is the most-significant bit (repo convention)
        if q < mode:
            ops.append(_Z)
        elif q == mode:
            ops.append(_LOWER.T if creation else _LOWER)
        else:
            ops.append(_I)
    m = ops[0]
    for o in ops[1:]:
        m = np.kron(m, o)
    return m


def fermion_dense(op: FermionOperator, n: int) -> np.ndarray:
    h = np.zeros((1 << n, 1 << n), dtype=complex)
    for term, coeff in op.terms.items():
        m = np.eye(1 << n, dtype=complex)
        for mode, creation in term:
            m = m @ _ladder_dense(mode, bool(creation), n)
        h = h + coeff * m
    return h


def random_fermion(rng, n=N_MODES, n_terms=4, max_len=3) -> FermionOperator:
    op = FermionOperator.zero()
    for _ in range(n_terms):
        length = int(rng.integers(0, max_len + 1))
        term = tuple(
            (int(rng.integers(0, n)), int(rng.integers(0, 2))) for _ in range(length)
        )
        coeff = complex(rng.normal(), rng.normal())
        op += FermionOperator(term, coeff)
    return op


def random_paulisum(rng, n=N_MODES, n_terms=5) -> PauliSum:
    terms = []
    for _ in range(n_terms):
        s = " ".join(
            f"{rng.choice(['X', 'Y', 'Z'])}{q}"
            for q in sorted(rng.choice(n, size=rng.integers(1, n), replace=False))
        )
        terms.append((s, complex(rng.normal(), rng.normal())))
    return PauliSum.from_terms(terms)


@pytest.mark.parametrize("seed", range(8))
class TestFermionProperties:
    def test_jw_matches_independent_dense(self, seed):
        rng = np.random.default_rng(seed)
        a = random_fermion(rng)
        np.testing.assert_allclose(
            paulisum_to_dense(jordan_wigner(a), N_MODES),
            fermion_dense(a, N_MODES),
            atol=1e-12,
        )

    def test_normal_order_preserves_operator(self, seed):
        rng = np.random.default_rng(100 + seed)
        a = random_fermion(rng)
        np.testing.assert_allclose(
            fermion_dense(normal_ordered(a), N_MODES),
            fermion_dense(a, N_MODES),
            atol=1e-10,
        )

    def test_hermitian_conjugate_is_dense_adjoint(self, seed):
        rng = np.random.default_rng(200 + seed)
        a = random_fermion(rng)
        np.testing.assert_allclose(
            fermion_dense(hermitian_conjugated(a), N_MODES),
            fermion_dense(a, N_MODES).conj().T,
            atol=1e-12,
        )

    def test_product_and_sum_are_homomorphic(self, seed):
        rng = np.random.default_rng(300 + seed)
        a, b = random_fermion(rng), random_fermion(rng)
        da, db = fermion_dense(a, N_MODES), fermion_dense(b, N_MODES)
        np.testing.assert_allclose(fermion_dense(a * b, N_MODES), da @ db, atol=1e-10)
        np.testing.assert_allclose(fermion_dense(a + b, N_MODES), da + db, atol=1e-12)


@pytest.mark.parametrize("seed", range(8))
class TestPauliProperties:
    def test_product_matches_dense(self, seed):
        rng = np.random.default_rng(400 + seed)
        a, b = random_paulisum(rng), random_paulisum(rng)
        np.testing.assert_allclose(
            paulisum_to_dense(a * b, N_MODES),
            paulisum_to_dense(a, N_MODES) @ paulisum_to_dense(b, N_MODES),
            atol=1e-10,
        )

    def test_commutator_matches_dense(self, seed):
        rng = np.random.default_rng(500 + seed)
        a, b = random_paulisum(rng), random_paulisum(rng)
        da, db = paulisum_to_dense(a, N_MODES), paulisum_to_dense(b, N_MODES)
        np.testing.assert_allclose(
            paulisum_to_dense(a.commutator(b), N_MODES), da @ db - db @ da, atol=1e-10
        )

    def test_dagger_matches_dense(self, seed):
        rng = np.random.default_rng(600 + seed)
        a = random_paulisum(rng)
        np.testing.assert_allclose(
            paulisum_to_dense(a.dagger(), N_MODES),
            paulisum_to_dense(a, N_MODES).conj().T,
            atol=1e-12,
        )

    def test_simplify_preserves_dense(self, seed):
        rng = np.random.default_rng(700 + seed)
        a = random_paulisum(rng)
        combined = a + a.copy() - 0.5 * a
        np.testing.assert_allclose(
            paulisum_to_dense(combined.simplify(), N_MODES),
            1.5 * paulisum_to_dense(a, N_MODES),
            atol=1e-10,
        )
