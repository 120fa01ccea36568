"""Entanglement diagnostics: reduced density matrices and entropies.

Bipartite entanglement of statevectors the engine produces — the standard
many-body diagnostics (area-law checks on ground states, linear entropy
growth after quenches) the reference framework has no counterpart for.

Computation is an exact partial trace: permute the ``(2,)*n`` factor
tensor so the kept qubits lead, reshape to ``(2^k, 2^{n-k})``, and either
SVD (entropy only, never materializes the density matrix) or contract
``M M^dag`` (the reduced density matrix itself).  Host numpy is fine —
these are analysis-layer calls on fetched states; every routine also
accepts jax arrays.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

__all__ = [
    "reduced_density_matrix",
    "entanglement_entropy",
    "renyi_entropy",
    "mutual_information",
    "site_qubits",
]


def site_qubits(sites: Sequence[int]) -> tuple:
    """Spin-orbital qubits of the given lattice sites (up on even JW modes,
    ops/lattice.py)."""
    out = []
    for s in sites:
        out.extend((2 * s, 2 * s + 1))
    return tuple(out)


def _lead_matrix(psi, n: int, keep: Sequence[int]) -> np.ndarray:
    """Reshape so the kept qubits index rows: ``M[a, b] = <a_keep, b_rest|psi>``."""
    keep = list(keep)
    if len(set(keep)) != len(keep):
        raise ValueError("duplicate qubits in subsystem")
    if not all(0 <= q < n for q in keep):
        raise ValueError("subsystem qubit out of range")
    rest = [q for q in range(n) if q not in keep]
    t = np.asarray(psi).reshape((2,) * n)
    # qubit q occupies tensor axis q (flat bit n-1-q => row-major axis q)
    t = np.transpose(t, keep + rest)
    return t.reshape(1 << len(keep), 1 << len(rest))


def reduced_density_matrix(psi, n: int, keep: Sequence[int]) -> np.ndarray:
    """``rho_A = Tr_B |psi><psi|`` over the kept qubits, ``(2^k, 2^k)``
    with rows indexed by the kept qubits in the order given."""
    m = _lead_matrix(psi, n, keep)
    return m @ m.conj().T


def _schmidt_squared(psi, n: int, keep: Sequence[int]) -> np.ndarray:
    m = _lead_matrix(psi, n, keep)
    # SVD of the smaller orientation
    if m.shape[0] > m.shape[1]:
        m = m.T
    s = np.linalg.svd(m, compute_uv=False)
    p = s * s
    return p / p.sum()  # guard tiny normalization drift


def entanglement_entropy(psi, n: int, keep: Sequence[int], base: float = np.e) -> float:
    """Von Neumann entropy ``S(rho_A) = -Tr rho_A log rho_A`` of the kept
    qubits (``base=2`` for bits; default nats)."""
    p = _schmidt_squared(psi, n, keep)
    p = p[p > 1e-16]
    return float(-(p * np.log(p)).sum() / np.log(base))


def renyi_entropy(
    psi, n: int, keep: Sequence[int], alpha: float = 2.0, base: float = np.e
) -> float:
    """Renyi-``alpha`` entropy ``(1-alpha)^-1 log Tr rho_A^alpha``
    (``alpha -> 1`` recovers von Neumann; ``alpha=2`` is the purity form
    measurable via swap tests)."""
    if alpha <= 0:
        raise ValueError("alpha must be positive")
    if abs(alpha - 1.0) < 1e-9:
        return entanglement_entropy(psi, n, keep, base)
    p = _schmidt_squared(psi, n, keep)
    return float(np.log((p**alpha).sum()) / (1.0 - alpha) / np.log(base))


def mutual_information(
    psi, n: int, a: Sequence[int], b: Sequence[int], base: float = np.e
) -> float:
    """``I(A:B) = S_A + S_B - S_AB`` (>= 0; bounds every connected
    correlator between the regions)."""
    if set(a) & set(b):
        raise ValueError("regions must be disjoint")
    sa = entanglement_entropy(psi, n, a, base)
    sb = entanglement_entropy(psi, n, b, base)
    sab = entanglement_entropy(psi, n, list(a) + list(b), base)
    return sa + sb - sab
