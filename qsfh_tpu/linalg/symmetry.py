"""Lattice point-group symmetry analysis of Hubbard eigenstates.

Implements the C4 irrep (s / px / py / d-wave) resolution of degenerate
ground manifolds that the reference left dead-commented at
``/root/reference/linalg/exact_diagonalization.py:54-179``, with two
deliberate corrections:

* **Fermionic antisymmetry.** A lattice symmetry permutes *modes*; the
  induced action on a Jordan-Wigner Fock basis state carries the parity
  sign of sorting the permuted occupied-mode list.  The reference's dead
  code moved raw amplitudes (no sign); that map does not commute with the
  Hamiltonian (rot90 on 2x2 already has commutator error ~1e1 unsigned vs
  ~1e-14 signed -- ``tests/test_symmetry.py::test_unsigned_reference_map_breaks_commutation``).
* **Character projectors** of the rotation group C4 replace the ad-hoc
  averaging chains (the same linear maps, but labeled and composable):
  ``P_s = (1+r+r^2+r^3)/4``, ``P_d = (1-r+r^2-r^3)/4``,
  ``P_E = (1-r^2)/2`` split into px/py by the x-axis reflection.

The site maps generalize the reference's hand tables (its 3x3 tables are
reproduced exactly -- tested) to any ``nx x ny`` periodic lattice:
rot90 is ``(x, y) -> (y, -x mod nx)`` (square lattices only), the
reflections are ``(x, y) -> (x, -y mod ny)`` / ``(-x mod nx, y)``.

Host-side f64 numpy, like the rest of the ED golden path
(:mod:`qsfh_tpu.linalg.exact`): this is build/analysis-time tooling, not
the accelerator compute path.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

from .exact import jw_get_ground_state

__all__ = [
    "rot90_site_map",
    "reflect_site_map",
    "translation_site_map",
    "mode_permutation",
    "permute_modes",
    "c4_irrep_components",
    "symmetry_adapted_states",
    "symmetry_adapted_ground_space",
    "irrep_weights",
    "momentum_weights",
    "momentum_project",
]


# -- site / mode permutations -------------------------------------------------


def rot90_site_map(nx: int, ny: int) -> List[int]:
    """90-degree lattice rotation as a site permutation (row-major sites).

    ``map[s_old] = s_new`` with ``(x, y) -> (y, (-x) mod nx)``; reproduces
    the reference's hand table for 3x3 (exact_diagonalization.py:57-63).
    Only square lattices have this symmetry.
    """
    if nx != ny:
        raise ValueError(f"rot90 needs a square lattice, got {nx}x{ny}")
    # row-major loop order matches site index s = x + y*nx
    return [y + ((-x) % nx) * nx for y in range(ny) for x in range(nx)]


def reflect_site_map(nx: int, ny: int, axis: str) -> List[int]:
    """Reflection site permutation: 'x' fixes x (``y -> -y``), 'y' fixes y.

    Reproduces the reference's 3x3 tables (exact_diagonalization.py:73-87).
    """
    out = []
    for y in range(ny):
        for x in range(nx):
            if axis == "x":
                xn, yn = x, (-y) % ny
            elif axis == "y":
                xn, yn = (-x) % nx, y
            else:
                raise ValueError(f"axis must be 'x' or 'y', got {axis!r}")
            out.append(xn + yn * nx)
    return out


def translation_site_map(nx: int, ny: int, dx: int, dy: int) -> List[int]:
    """Periodic lattice translation ``(x, y) -> (x+dx, y+dy)`` as a site
    permutation.  Valid on any periodic lattice; together with
    :func:`momentum_weights` this labels states by total lattice momentum
    (quantum numbers the reference never resolves)."""
    return [
        ((x + dx) % nx) + ((y + dy) % ny) * nx for y in range(ny) for x in range(nx)
    ]


def mode_permutation(site_map: Sequence[int]) -> np.ndarray:
    """Lift a site permutation to JW modes (spin-up on even, 2s / 2s+1)."""
    p = np.zeros(2 * len(site_map), dtype=np.int64)
    for s, sn in enumerate(site_map):
        p[2 * s] = 2 * sn
        p[2 * s + 1] = 2 * sn + 1
    return p


def permute_modes(psi: np.ndarray, perm: np.ndarray, signed: bool = True) -> np.ndarray:
    """Apply the second-quantized unitary ``U: a^dag_q -> a^dag_{perm[q]}``.

    ``psi`` is a full ``2^n`` statevector; mode ``q`` occupies bit
    ``n-1-q`` (the repo-wide convention, engine/state.py).  ``U|n> =
    sign * |n'>`` where ``n'`` occupies the permuted modes and ``sign``
    is the parity of sorting the image list of the (ascending) occupied
    modes -- the fermionic reordering sign the reference's dead code
    dropped.  ``signed=False`` reproduces that defective map (kept only
    so tests can demonstrate the defect).

    Vectorized over the nonzero amplitudes: occupancy bit-matrix, new
    indices by one matmul, inversion counts by one einsum over the static
    pair table of the permutation.
    """
    psi = np.asarray(psi)
    perm = np.asarray(perm, dtype=np.int64)
    n = perm.size
    if psi.shape != (1 << n,):
        raise ValueError(f"state has shape {psi.shape}, expected ({1 << n},)")
    idx = np.nonzero(psi)[0]
    shifts = n - 1 - np.arange(n)
    occ = ((idx[:, None] >> shifts[None, :]) & 1).astype(np.int64)  # (m, n)
    new_idx = occ @ (np.int64(1) << (n - 1 - perm))
    out = np.zeros_like(psi)
    if signed:
        q = np.arange(n)
        pair = ((q[:, None] < q[None, :]) & (perm[:, None] > perm[None, :])).astype(np.int64)
        inv = np.einsum("mq,qr,mr->m", occ, pair, occ)
        out[new_idx] = np.where(inv % 2 == 0, 1.0, -1.0) * psi[idx]
    else:
        out[new_idx] = psi[idx]
    return out


# -- irrep projections ----------------------------------------------------------


def c4_irrep_components(
    psi: np.ndarray, rotate: Callable[[np.ndarray], np.ndarray]
) -> Dict[str, np.ndarray]:
    """Character projections of ``psi`` under the cyclic group {1, r, r2, r3}.

    Returns the (unnormalized) A ('s', trivial), B ('d', alternating) and
    E components.  The reference's averaging chains
    (exact_diagonalization.py:148-171) expand to the same maps.
    """
    r1 = rotate(psi)
    r2 = rotate(r1)
    r3 = rotate(r2)
    return {
        "s": (psi + r1 + r2 + r3) / 4.0,
        "d": (psi - r1 + r2 - r3) / 4.0,
        "E": (psi - r2) / 2.0,
    }


def symmetry_adapted_states(
    psi0: np.ndarray, nx: int, ny: int, tol: float = 1e-8
) -> Tuple[Dict[str, np.ndarray], Dict[str, float]]:
    """Resolve a (generic) ground vector into normalized s/px/py/d states.

    ``psi0`` is any vector in the degenerate manifold (e.g. the Lanczos
    ground state of the sector-restricted Hamiltonian).  Components whose
    projection norm falls below ``tol`` are omitted (a non-generic seed
    can miss an irrep).  Returns ``(states, norms)`` where ``norms`` maps
    every label to the pre-normalization projection norm.
    """
    rot_perm = mode_permutation(rot90_site_map(nx, ny))
    mx_perm = mode_permutation(reflect_site_map(nx, ny, "x"))
    comps = c4_irrep_components(psi0, lambda s: permute_modes(s, rot_perm))
    e = comps.pop("E")
    mx_e = permute_modes(e, mx_perm)
    comps["px"] = (e + mx_e) / 2.0  # even under y -> -y, transforms like x
    comps["py"] = (e - mx_e) / 2.0
    states: Dict[str, np.ndarray] = {}
    norms: Dict[str, float] = {}
    for label in ("s", "px", "py", "d"):
        v = comps[label]
        nv = float(np.linalg.norm(v))
        norms[label] = nv
        if nv > tol:
            states[label] = v / nv
    return states, norms


def symmetry_adapted_ground_space(
    sparse_operator,
    particle_number: int,
    spin_up: int,
    spin_down: int,
    nx: int,
    ny: int,
    tol: float = 1e-8,
) -> Tuple[float, Dict[str, np.ndarray], Dict[str, float]]:
    """Working version of the reference's dead ``jw_get_ground_state_for_3x3``.

    Solves the sector ground state then resolves it into labeled C4 irrep
    members (reference exact_diagonalization.py:54-179, commented out
    there; signs fixed here).  Returns ``(energy, states, norms)``.
    """
    energy, psi0 = jw_get_ground_state(sparse_operator, particle_number, spin_up, spin_down)
    states, norms = symmetry_adapted_states(psi0, nx, ny, tol=tol)
    return energy, states, norms


def momentum_project(
    psi: np.ndarray, nx: int, ny: int, kx: int, ky: int
) -> np.ndarray:
    """Project onto total lattice momentum ``(2*pi*kx/nx, 2*pi*ky/ny)``.

    ``P_k = (1/N) sum_R exp(-i k . R) T_R`` over all ``N = nx*ny``
    translations, each applied with fermionic signs.  The projected
    component is an eigenvector of every ``T_R`` with eigenvalue
    ``exp(+i k . R)``.
    """
    psi = np.asarray(psi, dtype=complex)
    acc = np.zeros_like(psi)
    tx = mode_permutation(translation_site_map(nx, ny, 1, 0))
    ty = mode_permutation(translation_site_map(nx, ny, 0, 1))
    shifted_x = psi
    for dx in range(nx):
        shifted = shifted_x
        for dy in range(ny):
            phase = np.exp(-2j * np.pi * (kx * dx / nx + ky * dy / ny))
            acc = acc + phase * shifted
            if dy + 1 < ny:
                shifted = permute_modes(shifted, ty)
        if dx + 1 < nx:
            shifted_x = permute_modes(shifted_x, tx)
    return acc / (nx * ny)


def momentum_weights(psi: np.ndarray, nx: int, ny: int) -> Dict[Tuple[int, int], float]:
    """Weight ``||P_k psi||^2`` of a (normalized) state in each momentum
    sector; the weights sum to ``||psi||^2``.  A translation-invariant-
    generated ansatz conserves this distribution -- useful for diagnosing
    symmetry-protected optimization plateaus.

    ``P_k`` is a Hermitian projector, so ``||P_k psi||^2 = <psi|P_k|psi>
    = (1/N) sum_R e^{-i k.R} <psi|T_R|psi>``: the ``N`` translated states
    are built ONCE (N signed permutation passes total) and every momentum
    weight is a phase-weighted sum of the same N overlaps -- not N full
    projections of N passes each.
    """
    psi = np.asarray(psi, dtype=complex)
    tx = mode_permutation(translation_site_map(nx, ny, 1, 0))
    ty = mode_permutation(translation_site_map(nx, ny, 0, 1))
    overlaps = np.zeros((nx, ny), dtype=complex)  # <psi | T_(dx,dy) psi>
    shifted_x = psi
    for dx in range(nx):
        shifted = shifted_x
        for dy in range(ny):
            overlaps[dx, dy] = np.vdot(psi, shifted)
            if dy + 1 < ny:
                shifted = permute_modes(shifted, ty)
        if dx + 1 < nx:
            shifted_x = permute_modes(shifted_x, tx)
    dxs = np.arange(nx)[:, None]
    dys = np.arange(ny)[None, :]
    out: Dict[Tuple[int, int], float] = {}
    for kx in range(nx):
        for ky in range(ny):
            phases = np.exp(-2j * np.pi * (kx * dxs / nx + ky * dys / ny))
            out[(kx, ky)] = float(np.real((phases * overlaps).sum()) / (nx * ny))
    return out


def irrep_weights(psi: np.ndarray, states: Dict[str, np.ndarray]) -> Dict[str, float]:
    """``|<irrep_state | psi>|^2`` per labeled manifold member.

    The sum over labels equals the manifold fidelity of ``psi`` (the
    drivers' ``subspace_fidelity``) when the labeled states span the same
    subspace.
    """
    return {k: float(abs(np.vdot(v, np.asarray(psi))) ** 2) for k, v in states.items()}
