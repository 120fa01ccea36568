"""Static correlation functions and structure factors.

Equal-time two-point correlators of lattice states -- the standard
diagnostics (antiferromagnetic structure factor, density-density
correlations) the reference never computes.  Operators are built once as
packed Pauli Observables; evaluation is matrix-free over the statevector
(works for any state the engine can hold, sharded included).

Conventions: row-major sites ``s = x + y*nx``; spin-up on even JW modes
(SURVEY C12); spin operators per site are

    S_z(s) = (n_up - n_dn)/2,
    S_+(s) = c^dag_up c_dn,  S_x/S_y from S_+-,

so ``<S_i . S_j>`` sums the three Cartesian components.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..engine.expectation import Observable
from .fermion import FermionOperator
from .jw import jordan_wigner

__all__ = [
    "site_number_operator",
    "site_spin_z",
    "spin_spin_operator",
    "correlation_matrix",
    "structure_factor",
    "one_body_density_matrix",
    "momentum_distribution",
    "pair_correlation_matrix",
    "spin_q_operator",
    "charge_q_operator",
]


def site_number_operator(site: int) -> FermionOperator:
    up, dn = 2 * site, 2 * site + 1
    return FermionOperator(((up, 1), (up, 0))) + FermionOperator(((dn, 1), (dn, 0)))


def site_spin_z(site: int) -> FermionOperator:
    up, dn = 2 * site, 2 * site + 1
    return 0.5 * (
        FermionOperator(((up, 1), (up, 0))) - FermionOperator(((dn, 1), (dn, 0)))
    )


def _site_spin_pm(site: int, plus: bool) -> FermionOperator:
    up, dn = 2 * site, 2 * site + 1
    return FermionOperator(((up, 1), (dn, 0))) if plus else FermionOperator(((dn, 1), (up, 0)))


def spin_spin_operator(i: int, j: int) -> FermionOperator:
    """``S_i . S_j = Sz_i Sz_j + (S+_i S-_j + S-_i S+_j)/2``."""
    op = site_spin_z(i) * site_spin_z(j)
    op += 0.5 * (_site_spin_pm(i, True) * _site_spin_pm(j, False))
    op += 0.5 * (_site_spin_pm(i, False) * _site_spin_pm(j, True))
    return op


def correlation_matrix(
    psi, n_sites: int, kind: str = "spin", connected: bool = False
) -> np.ndarray:
    """``C[i, j] = <O_i O_j>`` over all site pairs.

    ``kind='spin'``: ``O_i O_j = S_i . S_j`` (full Heisenberg correlator);
    ``kind='density'``: ``O = n`` (total site density).  ``connected=True``
    subtracts ``<O_i><O_j>`` (density only; ``<S_i> = 0`` in the Sz-pinned
    sectors the drivers use).
    """
    psi = jnp.asarray(psi)
    n_qubits = 2 * n_sites
    c = np.zeros((n_sites, n_sites))
    for i in range(n_sites):
        for j in range(i, n_sites):
            if kind == "spin":
                op = spin_spin_operator(i, j)
            elif kind == "density":
                op = site_number_operator(i) * site_number_operator(j)
            else:
                raise ValueError("kind must be 'spin' or 'density'")
            val = float(Observable(jordan_wigner(op), n_qubits).expectation(psi))
            c[i, j] = c[j, i] = val
    if connected and kind == "density":
        means = np.array([
            float(Observable(jordan_wigner(site_number_operator(i)), n_qubits).expectation(psi))
            for i in range(n_sites)
        ])
        c = c - np.outer(means, means)
    return c


def one_body_density_matrix(psi, n_sites: int, spin: str = "up") -> np.ndarray:
    """``rho[i, j] = <c^dag_{i,spin} c_{j,spin}>`` (Hermitian, complex).

    Each off-diagonal entry is evaluated from two Hermitian observables,
    ``A = c^dag_i c_j + h.c.`` and ``B = -i (c^dag_i c_j - h.c.)``, so the
    engine's real expectation path applies: ``rho_ij = (<A> + i <B>) / 2``.
    Diagonals are the mode occupations.  ``trace(rho)`` equals the particle
    number of that spin species.
    """
    if spin not in ("up", "down"):
        raise ValueError("spin must be 'up' or 'down'")
    off = 0 if spin == "up" else 1
    psi = jnp.asarray(psi)
    n_qubits = 2 * n_sites
    rho = np.zeros((n_sites, n_sites), dtype=np.complex128)
    for i in range(n_sites):
        p = 2 * i + off
        rho[i, i] = float(
            Observable(
                jordan_wigner(FermionOperator(((p, 1), (p, 0)))), n_qubits
            ).expectation(psi)
        )
        for j in range(i + 1, n_sites):
            q = 2 * j + off
            hop = FermionOperator(((p, 1), (q, 0)))
            hop_dag = FermionOperator(((q, 1), (p, 0)))
            a = float(Observable(jordan_wigner(hop + hop_dag), n_qubits).expectation(psi))
            b = float(
                Observable(
                    jordan_wigner(-1j * hop + 1j * hop_dag), n_qubits
                ).expectation(psi)
            )
            rho[i, j] = 0.5 * (a + 1j * b)
            rho[j, i] = np.conj(rho[i, j])
    return rho


def pair_correlation_matrix(psi, n_sites: int) -> np.ndarray:
    """On-site (s-wave) pair correlator ``P[i, j] = <Delta^dag_i Delta_j>``
    with ``Delta_i = c_{i,dn} c_{i,up}``.

    Hermitian complex; diagonals are the double occupancies
    ``<n_{i,up} n_{i,dn}>``.  Long-range order in P (an off-diagonal-long-
    range-order eigenvalue scaling with N) is the superconducting
    diagnostic; for repulsive-U ground states it stays short-ranged.
    Evaluated from Hermitian A/B observable pairs like
    :func:`one_body_density_matrix`.
    """
    psi = jnp.asarray(psi)
    n_qubits = 2 * n_sites
    pair = np.zeros((n_sites, n_sites), dtype=np.complex128)
    for i in range(n_sites):
        for j in range(i, n_sites):
            up_i, dn_i = 2 * i, 2 * i + 1
            up_j, dn_j = 2 * j, 2 * j + 1
            # Delta^dag_i Delta_j = c^dag_{i,up} c^dag_{i,dn} c_{j,dn} c_{j,up}
            op = FermionOperator(((up_i, 1), (dn_i, 1), (dn_j, 0), (up_j, 0)))
            if i == j:
                pair[i, i] = float(
                    Observable(jordan_wigner(op), n_qubits).expectation(psi)
                )
                continue
            op_dag = FermionOperator(((up_j, 1), (dn_j, 1), (dn_i, 0), (up_i, 0)))
            a = float(
                Observable(jordan_wigner(op + op_dag), n_qubits).expectation(psi)
            )
            b = float(
                Observable(
                    jordan_wigner(-1j * op + 1j * op_dag), n_qubits
                ).expectation(psi)
            )
            pair[i, j] = 0.5 * (a + 1j * b)
            pair[j, i] = np.conj(pair[i, j])
    return pair


def _momentum_sum(nx: int, ny: int, qx: int, qy: int, site_op) -> FermionOperator:
    n = nx * ny
    out = FermionOperator.zero()
    for s in range(n):
        x, y = s % nx, s // nx
        phase = np.exp(2j * np.pi * (qx * x / nx + qy * y / ny))
        out += complex(phase / np.sqrt(n)) * site_op(s)
    return out.compress()


def spin_q_operator(nx: int, ny: int, qx: int, qy: int) -> FermionOperator:
    """Momentum-space spin-fluctuation operator
    ``S^z_q = N^{-1/2} sum_s e^{i q.r_s} S^z_s`` (row-major sites, same
    phase convention as :func:`structure_factor`).

    Non-Hermitian for ``q != 0`` (``(S^z_q)^dag = S^z_{-q}``); its role is
    seeding dynamical correlation functions: the Lanczos resolvent from
    ``S^z_q|gs>`` (linalg/spectral.py) yields the dynamical spin structure
    factor ``S^{zz}(q, omega)``, whose integrated weight is the static
    ``<gs|S^z_{-q} S^z_q|gs>`` (= S(q)/3 of :func:`structure_factor` in an
    SU(2)-singlet ground state).
    """
    return _momentum_sum(nx, ny, qx, qy, site_spin_z)


def charge_q_operator(
    nx: int, ny: int, qx: int, qy: int, filling: float | None = None
) -> FermionOperator:
    """Momentum-space density-fluctuation operator
    ``n_q = N^{-1/2} sum_s e^{i q.r_s} n_s``.

    For ``q != 0`` this is already the fluctuation (the lattice phases sum
    to zero against any uniform background).  At ``q = 0`` the operator is
    the conserved total number over ``sqrt(N)``: a number eigenstate gives
    a single elastic pole; pass ``filling = N_e / N`` to subtract the mean
    (``n_q - sqrt(N) * filling``) and obtain the exactly-connected
    operator (zero seed on a number eigenstate).  Seeding the Lanczos
    resolvent with ``n_q|gs>`` (linalg/spectral.py) yields the dynamical
    charge structure factor ``N(q, omega)``.
    """
    op = _momentum_sum(nx, ny, qx, qy, site_number_operator)
    if filling is not None and qx % nx == 0 and qy % ny == 0:
        op += FermionOperator.identity() * (-np.sqrt(nx * ny) * float(filling))
    return op


def momentum_distribution(
    rho: np.ndarray, nx: int, ny: int
) -> Dict[Tuple[int, int], float]:
    """``n(k) = <c^dag_k c_k> = (1/N) sum_{ij} e^{i k.(r_i - r_j)} rho[i, j]``
    on the discrete momentum grid (``c_k = N^{-1/2} sum_j e^{-i k.r_j} c_j``,
    matching ``ops/fourier.py``).  ``sum_k n(k) = trace(rho)``; for a U=0
    Slater-determinant ground state every ``n(k)`` is exactly 0 or 1.
    """
    n = nx * ny
    xs = np.arange(n) % nx
    ys = np.arange(n) // nx
    out = {}
    for kx in range(nx):
        for ky in range(ny):
            phase = np.exp(
                2j * np.pi * (kx * (xs[:, None] - xs[None, :]) / nx
                              + ky * (ys[:, None] - ys[None, :]) / ny)
            )
            out[(kx, ky)] = float(np.real(np.sum(phase * rho)) / n)
    return out


def structure_factor(corr: np.ndarray, nx: int, ny: int) -> Dict[Tuple[int, int], float]:
    """``S(q) = (1/N) sum_{ij} e^{i q.(r_i - r_j)} C[i, j]`` on the
    discrete momentum grid.  For the half-filled Hubbard ground state the
    spin structure factor peaks at the antiferromagnetic ``q = (pi, pi)``.
    """
    n = nx * ny
    xs = np.arange(n) % nx
    ys = np.arange(n) // nx
    out = {}
    for kx in range(nx):
        for ky in range(ny):
            phase = np.exp(
                2j * np.pi * (kx * (xs[:, None] - xs[None, :]) / nx
                              + ky * (ys[:, None] - ys[None, :]) / ny)
            )
            out[(kx, ky)] = float(np.real(np.sum(phase * corr)) / n)
    return out
