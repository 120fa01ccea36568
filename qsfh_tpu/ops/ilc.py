"""iQCC-ILC: involutory-linear-combination epochs for the dense backend.

The round-4 campaign measured exact-dressing iQCC (greedy DIS + QMF, the
reference algorithm of /root/reference/models/iqcc_hubbard.py:145-189)
converging GEOMETRICALLY to a fixed point 0.2477 Ha above ED on the 2x3
lattice (benchmarks/demo_iqcc_2x3_r4/dense.json): per-epoch gains decay
at ratio ~0.58 while the DIS stays populated (111 generators above
threshold, g_max 9.6e-3 at the plateau) -- the known saturation of
first-order single-generator QCC steps from a mean-field reference,
which the iQCC-ILC literature (Lang/Ryabinkin/Izmaylov's involutory
linear combinations) addresses by rotating with
``U = exp(-i tau/2 * sum_k c_k P_k)`` over MUTUALLY ANTICOMMUTING Pauli
strings.

For such a set, ``G = sum_k c_k P_k`` with ``sum c_k^2 = 1`` squares to
the identity, so ``U = cos(tau/2) I - i sin(tau/2) G`` in closed form,
and the reachable states are exactly

    |w> = a_0 |0> - i sum_k b_k P_k |0>,   a = (a_0, b) real, |a|_2 = 1.

Two structural facts make the optimal step a PLAIN symmetric
eigenproblem (no generalized metric, no line search):

* each ``P_k`` is Hermitian, so ``<0|P_k|0>`` is real and the 0-k Gram
  cross terms ``Re<v_0|v_k> = Im<0|P_k|0>`` vanish;
* anticommutation kills the j-k cross terms,
  ``Re<0|P_j P_k|0> = delta_jk``.

Hence ``<w|w> = |a|_2^2`` identically and
``E(a) = a^T A a`` with ``A_ij = Re <v_i| H |v_j>``,
``v_0 = |0>``, ``v_k = -i P_k |0>``: the minimizer is the lowest
eigenvector of ``A``, the predicted energy its eigenvalue, and descent
is monotone by construction (``e_0^T A e_0`` is the current energy).
Crucially the k-j block carries SECOND-ORDER couplings, so the step
stays productive at states where every first-order DIS gradient
(``A_0k``) has collapsed -- exactly the measured plateau.

The dense backend folds the ILC unitary with zero truncation error
(``H <- U^dag H U``, two ZGEMMs), so these epochs compose freely with
the standard iQCC epochs of :class:`qsfh_tpu.algos.iqcc.IQCC`.

No reference counterpart: the reference's symbolic dressing cannot even
reach the plateau at 2x3 (term explosion), let alone step past it.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from .pauli import PauliSum
from ..utils.dense import _qubit_masks_to_bit_masks

__all__ = [
    "pauli_anticommute",
    "string_column",
    "ilc_scores",
    "greedy_anticommuting_set",
    "ilc_step_dense",
]


def pauli_anticommute(x1: int, z1: int, x2: int, z2: int) -> bool:
    """True iff the Hermitian Pauli strings (x1,z1), (x2,z2) anticommute
    (symplectic form ``popcount(x1&z2) + popcount(x2&z1)`` odd)."""
    return (
        int(x1 & z2).bit_count() + int(x2 & z1).bit_count()
    ) % 2 == 1


def string_column(P: PauliSum, psi: np.ndarray, n_qubits: int) -> np.ndarray:
    """``P |psi>`` for a single Hermitian Pauli string (XOR gather +
    z-parity signs; same matrix convention as ops.dense_dressing)."""
    if len(P.c) != 1:
        raise ValueError("generators must be single Pauli strings")
    dim = 1 << n_qubits
    idx = np.arange(dim, dtype=np.int64)
    xb = _qubit_masks_to_bit_masks(int(P.x[0]), n_qubits)
    zb = _qubit_masks_to_bit_masks(int(P.z[0]), n_qubits)
    signs = 1.0 - 2.0 * (np.bitwise_count(idx & zb) % 2).astype(np.float64)
    out = np.empty(dim, dtype=np.complex128)
    # M[b ^ xb, b] = c * (-1)^{zb.b}  =>  (P psi)[b ^ xb] = c s(b) psi[b]
    out[idx ^ xb] = complex(P.c[0]) * signs * psi
    return out


def ilc_scores(
    H: np.ndarray, psi: np.ndarray, gens: Sequence[PauliSum], n_qubits: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """Per-generator 2x2 subspace gains (the exact single-generator QCC
    improvement INCLUDING curvature, not just the gradient).

    Builds ``V[:, k] = -i P_k |psi>`` for every candidate, one ZGEMM
    ``W = H V``, then per k the lowest eigenvalue of
    ``[[E0, A0k], [A0k, Bkk]]``.  Returns (scores, A0, Bdiag, E0) where
    ``score_k = E0 - lambda_min_k >= 0``.
    """
    psi = np.asarray(psi, dtype=np.complex128)
    E0 = float(np.real(np.vdot(psi, H @ psi)))
    V = np.empty((psi.size, len(gens)), dtype=np.complex128)
    for k, P in enumerate(gens):
        V[:, k] = -1j * string_column(P, psi, n_qubits)
    W = H @ V
    A0 = np.real(psi.conj() @ W)  # Re <0|H|v_k>  (= g_k / 2)
    Bd = np.real(np.einsum("ik,ik->k", V.conj(), W))
    half = 0.5 * (E0 + Bd)
    rad = np.sqrt(0.25 * (E0 - Bd) ** 2 + A0**2)
    scores = E0 - (half - rad)
    return scores, A0, Bd, E0


def greedy_anticommuting_set(
    gens: Sequence[PauliSum], scores: np.ndarray, cap: int
) -> List[int]:
    """Indices of a mutually anticommuting subset, greedily by descending
    score (ties broken by list order, matching the DIS convention)."""
    order = np.argsort(-scores, kind="stable")
    return _greedy_from_order(gens, order, cap)


def _greedy_from_order(
    gens: Sequence[PauliSum], order, cap: int
) -> List[int]:
    chosen: List[int] = []
    masks: List[Tuple[int, int]] = []
    for i in order:
        xi, zi = int(gens[i].x[0]), int(gens[i].z[0])
        if all(pauli_anticommute(xi, zi, x, z) for x, z in masks):
            chosen.append(int(i))
            masks.append((xi, zi))
            if len(chosen) >= cap:
                break
    return chosen


def candidate_anticommuting_sets(
    gens: Sequence[PauliSum],
    scores: np.ndarray,
    cap: int,
    restarts: int = 16,
    seed: int = 0,
) -> List[List[int]]:
    """Several anticommuting subsets to rank by realized subspace gain.

    Pure score-greedy sets measured TINY at the 2x3 plateau (2-4 members
    -- once the top scorer is in, most of the DIS commutes with it), and
    the ILC gain grows with the subspace, so set construction is a real
    degree of freedom.  Candidates: the score-greedy set, plus
    ``restarts`` score-biased random orders (Gumbel perturbation of
    log-scores: higher-scored generators still lead, but the commuting
    blockers shuffle), plus ``restarts`` size-first variants seeded by
    each of the top scorers individually.  Deduplicated; caller solves
    the (M+1)-eigenproblem per candidate and keeps the best.
    """
    rng = np.random.default_rng(seed)
    base = np.log(np.maximum(scores, 1e-300))
    cands: List[List[int]] = [greedy_anticommuting_set(gens, scores, cap)]
    for _ in range(restarts):
        noisy = base + rng.gumbel(size=len(base))
        cands.append(_greedy_from_order(gens, np.argsort(-noisy), cap))
    # seed each top scorer, then fill by descending score
    top = np.argsort(-scores, kind="stable")[: max(1, restarts)]
    rest = np.argsort(-scores, kind="stable")
    for t in top:
        order = np.concatenate(([t], rest[rest != t]))
        cands.append(_greedy_from_order(gens, order, cap))
    seen, out = set(), []
    for c in cands:
        key = tuple(sorted(c))
        if c and key not in seen:
            seen.add(key)
            out.append(c)
    return out


def _pauli_rowcol_data(P: PauliSum, n_qubits: int):
    """(xb, data) with ``P[i, i ^ xb] = data[i ^ xb]`` (single string)."""
    dim = 1 << n_qubits
    idx = np.arange(dim, dtype=np.int64)
    xb = _qubit_masks_to_bit_masks(int(P.x[0]), n_qubits)
    zb = _qubit_masks_to_bit_masks(int(P.z[0]), n_qubits)
    signs = 1.0 - 2.0 * (np.bitwise_count(idx & zb) % 2).astype(np.float64)
    return xb, complex(P.c[0]) * signs


def fold_ilc_dense(
    H: np.ndarray, sub: Sequence[PauliSum], a: np.ndarray, n_qubits: int
) -> np.ndarray:
    """``U^dag H U`` for ``U = a_0 I - i sum_k a_{k+1} P_k`` WITHOUT
    materializing U: expanding,

        U^dag H U = a_0^2 H + i a_0 (G H - H G) + G H G,   G = sum b_k P_k,

    and each ``P_k M`` / ``M P_k`` is a permuted-sign row/column pass
    (``(P M)[i, :] = data[i^xb] M[i^xb, :]``), so the fold is
    ``O(M 4^n)`` instead of the ``O(8^n)`` ZGEMM pair -- ~700x fewer ops
    at 12 qubits with a 32-generator set (ZGEMM parity in
    tests/test_ilc.py)."""
    dim = 1 << n_qubits
    idx = np.arange(dim, dtype=np.int64)
    a0 = float(a[0])
    b = np.asarray(a[1:], dtype=np.float64)
    rc = [_pauli_rowcol_data(P, n_qubits) for P in sub]
    GH = np.zeros_like(H)
    for (xb, data), bk in zip(rc, b):
        GH[idx ^ xb] += bk * (data[:, None] * H)  # (P_k H)[i^xb,:] = d[i] H[i,:]
    HG = np.zeros_like(H)
    GHG = np.zeros_like(H)
    for (xb, data), bk in zip(rc, b):
        HG += bk * (H[:, idx ^ xb] * data[None, :])
        GHG += bk * (GH[:, idx ^ xb] * data[None, :])
    return a0 * a0 * H + 1j * a0 * (GH - HG) + GHG


def ilc_step_dense(
    H: np.ndarray,
    psi: np.ndarray,
    gens: Sequence[PauliSum],
    n_qubits: int,
    cap: int = 32,
    restarts: int = 16,
) -> Tuple[np.ndarray, float, dict]:
    """One ILC epoch: pick an anticommuting subset of ``gens`` (several
    candidate sets, ranked by realized subspace eigenvalue), solve the
    (M+1)-dim symmetric eigenproblem, fold the ILC unitary into ``H``.

    Returns ``(H_dressed, E_pred, info)``; ``E_pred`` is the exact energy
    of the folded Hamiltonian at ``psi`` (the subspace eigenvalue --
    asserted against the fold to 1e-10 in tests).
    """
    psi = np.asarray(psi, dtype=np.complex128)
    scores, A0, Bd, E0 = ilc_scores(H, psi, gens, n_qubits)

    def subspace(sel):
        sub = [gens[i] for i in sel]
        V = np.empty((psi.size, len(sub) + 1), dtype=np.complex128)
        V[:, 0] = psi
        for k, P in enumerate(sub):
            V[:, k + 1] = -1j * string_column(P, psi, n_qubits)
        A = np.real(V.conj().T @ (H @ V))
        A = 0.5 * (A + A.T)
        evals, evecs = np.linalg.eigh(A)
        a = evecs[:, 0]
        if a[0] < 0:
            a = -a
        return sub, a, float(evals[0])

    best = None
    for sel in candidate_anticommuting_sets(gens, scores, cap,
                                            restarts=restarts):
        sub, a, e_sub = subspace(sel)
        if best is None or e_sub < best[2]:
            best = (sub, a, e_sub)
    if best is None:
        return H, E0, {"selected": 0, "E0": E0}
    sub, a, e_sub = best
    Hd = fold_ilc_dense(H, sub, a, n_qubits)
    info = {
        "selected": len(sub),
        "E0": E0,
        "E_pred": e_sub,
        "gain": float(E0 - e_sub),
        "best_single_gain": float(scores.max()),
        "a0": float(a[0]),
        "labels": [P.to_terms()[0][0] for P in sub],
    }
    return Hd, e_sub, info
