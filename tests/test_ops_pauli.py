"""Unit tests: packed Pauli algebra against hand-derived tables."""

import numpy as np
import pytest

from qsfh_tpu.ops.pauli import PauliSum, qubit_operator
from qsfh_tpu.utils.dense import paulisum_to_dense

I2 = np.eye(2)
X = np.array([[0, 1], [1, 0]], dtype=complex)
Y = np.array([[0, -1j], [1j, 0]], dtype=complex)
Z = np.array([[1, 0], [0, -1]], dtype=complex)


def kron(*ms):
    out = np.array([[1.0 + 0j]])
    for m in ms:
        out = np.kron(out, m)
    return out


def dense(op, n):
    return paulisum_to_dense(op, n)


def test_single_paulis_dense():
    # qubit 0 is the most significant factor
    assert np.allclose(dense(qubit_operator("X0"), 2), kron(X, I2))
    assert np.allclose(dense(qubit_operator("Y1"), 2), kron(I2, Y))
    assert np.allclose(dense(qubit_operator("Z0"), 2), kron(Z, I2))
    assert np.allclose(dense(qubit_operator("X0 Z1"), 2), kron(X, Z))
    assert np.allclose(dense(qubit_operator("Y0 Y1"), 2), kron(Y, Y))


def test_products():
    x = qubit_operator("X0")
    y = qubit_operator("Y0")
    z = qubit_operator("Z0")
    assert np.allclose(dense(x * y, 1), 1j * dense(z, 1))
    assert np.allclose(dense(y * x, 1), -1j * dense(z, 1))
    assert np.allclose(dense(z * x, 1), 1j * dense(y, 1))
    assert np.allclose(dense(x * x, 1), np.eye(2))
    # multi-qubit product
    a = qubit_operator("X0 Y1", 2.0)
    b = qubit_operator("Z0 Z1", 0.5 - 1j)
    assert np.allclose(dense(a * b, 2), dense(a, 2) @ dense(b, 2))


def test_addition_merges_duplicates():
    s = qubit_operator("X0 Y1", 1.0) + qubit_operator("X0 Y1", 2.0) + qubit_operator("Z0", 1.0)
    assert len(s) == 2
    terms = dict(s.to_terms())
    assert terms["X0 Y1"] == pytest.approx(3.0)


def test_cancellation():
    s = qubit_operator("X0", 1.0) - qubit_operator("X0", 1.0)
    assert len(s) == 0


def test_dagger_and_hermiticity():
    h = qubit_operator("Y0 X1", 0.7) + qubit_operator("Z0", -1.2)
    assert h.is_hermitian()
    m = dense(h, 2)
    assert np.allclose(m, m.conj().T)
    a = qubit_operator("X0 Y1", 1j)
    assert np.allclose(dense(a.dagger(), 2), dense(a, 2).conj().T)


def test_commutator():
    a = qubit_operator("X0", 1.0)
    b = qubit_operator("Y0", 1.0)
    c = a.commutator(b)
    assert np.allclose(dense(c, 1), dense(a, 1) @ dense(b, 1) - dense(b, 1) @ dense(a, 1))
    # commuting operators
    d = qubit_operator("X0 X1").commutator(qubit_operator("Y0 Y1"))
    assert len(d) == 0


def test_roundtrip_strings():
    s = PauliSum.from_terms([("X0 Y2 Z5", 1.5), ("Y1", -0.25j), ("", 3.0)])
    terms = dict(s.to_terms())
    assert terms["X0 Y2 Z5"] == pytest.approx(1.5)
    assert terms["Y1"] == pytest.approx(-0.25j)
    assert terms[""] == pytest.approx(3.0)
    assert s.constant() == pytest.approx(3.0)


def test_rotation_terms_skip_identity_and_imag():
    s = PauliSum.from_terms([("X0", 0.5), ("", 2.0), ("Z1", 1e-15)])
    rots = s.rotation_terms()
    assert len(rots) == 1
    x, z, scale = rots[0]
    assert x == 1 and z == 0 and scale == pytest.approx(0.5)
