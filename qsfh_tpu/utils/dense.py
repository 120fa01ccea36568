"""Dense/sparse matrix realizations of packed Pauli sums (host, test/ED use).

Bit convention matches the reference stack (OpenFermion ``get_sparse_operator``
+ PennyLane states): qubit 0 is the MOST significant bit of the statevector
index, i.e. basis index ``b`` has qubit ``q`` occupied iff bit
``(n_qubits - 1 - q)`` of ``b`` is set (see
``/root/reference/linalg/exact_diagonalization.py:23``).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..ops.pauli import PauliSum


def _qubit_masks_to_bit_masks(mask: int, n_qubits: int) -> int:
    """Convert a qubit-indexed mask (bit q = qubit q) to a basis-bit mask."""
    out = 0
    for q in range(n_qubits):
        if (mask >> q) & 1:
            out |= 1 << (n_qubits - 1 - q)
    return out


def paulisum_to_sparse(op: PauliSum, n_qubits: int) -> sp.csr_matrix:
    """2^n x 2^n sparse matrix of a PauliSum (qubit 0 = MSB)."""
    dim = 1 << n_qubits
    idx = np.arange(dim, dtype=np.int64)
    total = sp.csr_matrix((dim, dim), dtype=np.complex128)
    for x, z, c in zip(op.x, op.z, op.c):
        xb = _qubit_masks_to_bit_masks(int(x), n_qubits)
        zb = _qubit_masks_to_bit_masks(int(z), n_qubits)
        # (c X^x Z^z |b>) contributes amplitude c*(-1)^{z.b} at row (b ^ x), col b
        rows = idx ^ xb
        signs = 1.0 - 2.0 * (np.bitwise_count(idx & zb) % 2).astype(np.float64)
        data = c * signs
        total = total + sp.csr_matrix((data, (rows, idx)), shape=(dim, dim))
    return total


def paulisum_to_dense(op: PauliSum, n_qubits: int) -> np.ndarray:
    return paulisum_to_sparse(op, n_qubits).toarray()


def apply_paulisum_dense(op: PauliSum, psi: np.ndarray, n_qubits: int) -> np.ndarray:
    """Matrix-free numpy application (for golden tests)."""
    dim = 1 << n_qubits
    idx = np.arange(dim, dtype=np.int64)
    out = np.zeros(dim, dtype=np.complex128)
    for x, z, c in zip(op.x, op.z, op.c):
        xb = _qubit_masks_to_bit_masks(int(x), n_qubits)
        zb = _qubit_masks_to_bit_masks(int(z), n_qubits)
        signs = 1.0 - 2.0 * (np.bitwise_count(idx & zb) % 2).astype(np.float64)
        out[idx ^ xb] += c * signs * psi
    return out
