"""Exact dense-matrix iQCC dressing for small qubit counts.

The symbolic dressing (ops/dressing.py) multiplies the packed-Pauli term
count per epoch; at 2x3 (12 qubits) an UNCAPPED run reaches 586k terms
after two epochs (benchmarks/demo_iqcc_2x3_r4/probe_growth.json) on its
way to the 4^12 = 16.7M saturation, and any hard cap silently destroys
physics (the round-3 20k-cap run degraded monotonically after epoch 4).

At saturation a PauliSum IS a dense matrix with overhead: 4^n complex
coefficients.  This module keeps the dressed Hamiltonian as the dense
2^n x 2^n matrix instead -- the similarity transform U^dag H U is two
ZGEMMs per epoch, EXACT (zero truncation error, term growth is a
non-issue), and the Pauli decomposition needed for DIS generator
selection is recovered by a fast Walsh-Hadamard transform over the
XOR-diagonals in O(4^n log 2^n).

Reference counterpart: /root/reference/models/iqcc_hubbard.py:184-189
dresses symbolically (OpenFermion dict algebra) and only configures 2x2,
where term growth stops at ~5k; this backend is what lets the same
algorithm survive 2x3+ exactly.

Conventions match utils/dense.py: qubit 0 = MSB, a packed term
c X^x Z^z contributes M[b ^ xb, b] = c * (-1)^{zb . b} with
xb/zb = flat (bit-reversed) masks.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from .pauli import PauliSum
from ..utils.dense import _qubit_masks_to_bit_masks, paulisum_to_dense

__all__ = [
    "fwht",
    "dense_to_paulisum",
    "paulisum_to_dense_fast",
    "dense_dis_generators",
    "dress_dense",
    "DenseObservable",
]


def fwht(a: np.ndarray) -> np.ndarray:
    """Walsh-Hadamard transform along the LAST axis (unnormalized):
    out[..., t] = sum_b (-1)^{popcount(t & b)} a[..., b]."""
    dim = a.shape[-1]
    h = 1
    a = a.copy()
    while h < dim:
        a = a.reshape(*a.shape[:-1], dim // (2 * h), 2, h)
        x = a[..., 0, :].copy()
        y = a[..., 1, :]
        a[..., 0, :] = x + y
        a[..., 1, :] = x - y
        a = a.reshape(*a.shape[:-3], dim)
        h *= 2
    return a


def dense_to_paulisum(M: np.ndarray, n_qubits: int, tol: float = 1e-10) -> PauliSum:
    """Exact Pauli decomposition of a 2^n x 2^n matrix.

    c(x, z) = 2^-n sum_b M[b ^ xb, b] (-1)^{zb . b}: for each flat flip
    mask the XOR-diagonal is gathered, then one vectorized FWHT over the
    phase index recovers every z at once.  Terms with |c| <= ``tol`` are
    dropped (pure float noise for matrices that started life as Pauli
    sums); masks are returned in qubit-indexed convention.
    """
    dim = 1 << n_qubits
    if M.shape != (dim, dim):
        raise ValueError(f"expected ({dim}, {dim}) matrix")
    idx = np.arange(dim)
    # V[xf, b] = M[b ^ xf, b]
    V = M[idx[None, :] ^ idx[:, None], idx[None, :]]
    C = fwht(V) / dim  # C[xf, zf]
    xf, zf = np.nonzero(np.abs(C) > tol)
    c = C[xf, zf]
    # flat -> qubit mask is an n-bit reversal (involution)
    rev = np.zeros(dim, dtype=np.int64)
    for q in range(n_qubits):
        rev |= ((idx >> (n_qubits - 1 - q)) & 1) << q
    return PauliSum(
        rev[xf].astype(np.uint64), rev[zf].astype(np.uint64), np.asarray(c)
    )


def paulisum_to_dense_fast(P: PauliSum, n_qubits: int) -> np.ndarray:
    """Dense matrix of a PauliSum in O(4^n log 2^n) regardless of term
    count -- the exact inverse of :func:`dense_to_paulisum`.

    ``utils.dense.paulisum_to_dense`` builds one sparse matrix PER TERM
    (fine for the <=200-term golden tests it serves); resuming a dressed
    iQCC checkpoint means re-densifying a 586k-term sum, where the
    scatter-into-C + one FWHT route is ~1000x faster.
    """
    dim = 1 << n_qubits
    idx = np.arange(dim)
    # qubit-indexed -> flat (bit-reversed) masks, vectorized over terms
    xf = np.zeros(len(P.c), dtype=np.int64)
    zf = np.zeros(len(P.c), dtype=np.int64)
    x = P.x.astype(np.int64)
    z = P.z.astype(np.int64)
    for q in range(n_qubits):
        bit = n_qubits - 1 - q
        xf |= ((x >> q) & 1) << bit
        zf |= ((z >> q) & 1) << bit
    C = np.zeros((dim, dim), dtype=np.complex128)
    np.add.at(C, (xf, zf), P.c)
    V = fwht(C)  # V[xf, b] = sum_z c(xf, z) (-1)^{zb.b}
    M = np.empty((dim, dim), dtype=np.complex128)
    M[idx[:, None] ^ idx[None, :], idx[None, :]] = V
    return M


def dense_dis_generators(
    M: np.ndarray, n_qubits: int, tol: float = 1e-10
) -> Tuple[List[Tuple[Tuple[int, ...], PauliSum]], int]:
    """DIS generator list straight from the dense matrix.

    The flip-index partition (reference ``iqcc.py:73-92``) needs only the
    set of DISTINCT x flip masks with support, NOT the full Pauli term
    list -- which saturates toward 4^n terms under exact dressing (2x3
    reaches 586k after two epochs) and makes the
    ``dense_to_paulisum`` -> Python-loop ``dis_generators`` route O(4^n)
    per epoch.  Here each XOR-diagonal's FWHT row gives the z-resolved
    coefficients for one flip mask; a flip qualifies if any |c| > tol.

    Returns ([(flips, P = Y X..X)], nnz_terms) with generators ordered by
    ascending qubit x-mask -- the SAME order the symbolic path yields,
    because ``PauliSum.simplify`` lexsorts terms by (x, z) so
    ``dis_generators``'s first-appearance scan walks ascending x.  Order
    matters beyond labeling: gradient TIES (degenerate generator pairs)
    are broken by list position, and the rotations are applied in
    selection order.
    """
    dim = 1 << n_qubits
    if M.shape != (dim, dim):
        raise ValueError(f"expected ({dim}, {dim}) matrix")
    idx = np.arange(dim)
    V = M[idx[None, :] ^ idx[:, None], idx[None, :]]
    C = np.abs(fwht(V)) / dim  # |c|[xf, zf]
    nnz = int(np.count_nonzero(C > tol))
    weight = C.max(axis=1)  # per flip mask
    # flat -> qubit mask bit reversal
    rev = np.zeros(dim, dtype=np.int64)
    for q in range(n_qubits):
        rev |= ((idx >> (n_qubits - 1 - q)) & 1) << q
    out: List[Tuple[Tuple[int, ...], PauliSum]] = []
    for x in np.sort(rev[weight > tol]):
        x = int(x)
        if x == 0:
            continue
        flips = tuple(q for q in range(x.bit_length()) if (x >> q) & 1)
        label = " ".join(
            ("Y" if i == 0 else "X") + str(q) for i, q in enumerate(flips)
        )
        out.append((flips, PauliSum.from_string(label)))
    return out, nnz


def _string_row_data(P: PauliSum, n_qubits: int):
    """(xb_flat, data) of a single Hermitian-string PauliSum: the dense
    matrix has M[b ^ xb, b] = data[b] (same formula as paulisum_to_sparse,
    so the convention can never drift)."""
    if len(P.c) != 1:
        raise ValueError("generators must be single Pauli strings")
    dim = 1 << n_qubits
    idx = np.arange(dim, dtype=np.int64)
    xb = _qubit_masks_to_bit_masks(int(P.x[0]), n_qubits)
    zb = _qubit_masks_to_bit_masks(int(P.z[0]), n_qubits)
    signs = 1.0 - 2.0 * (np.bitwise_count(idx & zb) % 2).astype(np.float64)
    return xb, complex(P.c[0]) * signs


def dress_dense(
    H: np.ndarray,
    generators: Sequence[PauliSum],
    taus: Sequence[float],
    n_qubits: int,
) -> np.ndarray:
    """U_c^dag H U_c for the circuit U_c = R_{K-1} ... R_0,
    R_k = exp(-i tau_k P_k / 2) -- the dense-exact equivalent of
    ``ops.dressing.dress_hamiltonian`` (same reversed-application
    semantics, verified in tests/test_iqcc.py).

    U_c is materialized by K permuted-axpy passes (each rotation touches
    the full matrix once: cos I - i sin P acting row-wise), then ONE pair
    of ZGEMMs applies the similarity transform.
    """
    dim = 1 << n_qubits
    idx = np.arange(dim, dtype=np.int64)
    U = np.eye(dim, dtype=np.complex128)
    # two preallocated scratch planes: the naive per-rotation form
    # (PU[idx^xb] = data[:,None]*U; U = c*U - 1j*s*PU) allocates three
    # 2^n x 2^n temporaries PER ROTATION, which at the 768-tau epoch of
    # the threshold-1e-3 2x3 control run measured ~3 s/rotation (~40 min
    # per fold).  In-place passes cut that ~3x; same math bit-for-bit
    # ordering per element (verified by tests/test_iqcc.py goldens).
    prod = np.empty_like(U)
    pu = np.empty_like(U)
    for P, tau in zip(generators, taus):
        xb, data = _string_row_data(P, n_qubits)
        c = np.cos(tau / 2.0)
        s = np.sin(tau / 2.0)
        np.multiply(U, data[:, None], out=prod)
        # PU[idx ^ xb] = prod  <=>  PU = prod[idx ^ xb] (XOR involution)
        np.take(prod, idx ^ xb, axis=0, out=pu)
        pu *= -1j * s
        U *= c
        U += pu
    return U.conj().T @ H @ U


class DenseObservable:
    """Drop-in for the two Observable methods the iQCC loop touches,
    backed by the dense matrix (device matvec, f64 on CPU)."""

    def __init__(self, H: np.ndarray, n_qubits: int):
        import jax.numpy as jnp

        self.n = n_qubits
        self._H = jnp.asarray(H)

    def apply_auto(self, psi):
        return self._H @ psi

    def expectation_auto(self, psi):
        import jax.numpy as jnp

        return jnp.real(jnp.vdot(psi, self._H @ psi))
