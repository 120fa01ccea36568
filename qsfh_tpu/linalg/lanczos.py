"""Matrix-free Lanczos ground-state solver, jitted end to end.

TPU-native replacement for the reference's exact-diagonalization baseline
(``/root/reference/linalg/exact_diagonalization.py:34-51``): instead of
materializing a 2^n x 2^n sparse matrix (OpenFermion ``get_sparse_operator``)
and calling ARPACK, the Hamiltonian is applied matrix-free from its packed
Pauli arrays (one fused reverse per distinct flip mask), the Krylov basis is
built with full reorthogonalization inside ``lax.scan``, and only the tiny
tridiagonal eigenproblem leaves the device.

Symmetry restriction: Hubbard conserves (N, Sz), so seeding the iteration
with a vector projected onto the target sector keeps every Krylov vector in
that sector exactly -- the elementwise-mask analog of the reference's
``operator[np.ix_(indices, indices)]`` restriction.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.expectation import Observable
from ..engine.state import real_dtype
from ..ops.pauli import PauliSum
from .sectors import jw_number_spin_indices, sector_dimension


def _sector_matvec(hamiltonian: PauliSum, n_qubits, n_electrons, spin_up, spin_down, dtype):
    """(matvec over SECTOR coordinates, sector index array).

    The Krylov iteration runs in the C(n,N)-dimensional sector space --
    reorthogonalizing 2^n-length vectors dominated the old full-space
    formulation (a (k, 2^n) basis is ~1 GB at 18 qubits) -- while each
    matvec scatters to the full space, applies the packed Hamiltonian
    matrix-free, and gathers back.  The embedding order is bit-for-bit the
    reference's (exact_diagonalization.py:26-32 sector restriction).
    """
    obs = Observable(hamiltonian, n_qubits)
    idx = jnp.asarray(
        jw_number_spin_indices(n_electrons, spin_up, spin_down, n_qubits),
        dtype=jnp.int64 if jax.config.jax_enable_x64 else jnp.int32,
    )
    dim_full = 1 << n_qubits

    def mv(v):
        full = jnp.zeros(dim_full, dtype=dtype).at[idx].set(v)
        return obs.apply(full)[idx]

    return mv, idx


@partial(jax.jit, static_argnames=("matvec", "k"))
def _lanczos_basis(matvec, v0: jnp.ndarray, k: int):
    """Run k Lanczos steps with full reorthogonalization.

    Returns (alphas, betas, V) with V of shape (k, dim); rows beyond
    breakdown are zero.
    """
    dim = v0.shape[0]
    dtype = v0.dtype
    rdt = real_dtype(dtype)

    V = jnp.zeros((k, dim), dtype=dtype)
    v = v0 / jnp.linalg.norm(v0)
    V = V.at[0].set(v)

    def body(carry, j):
        V, v, beta_prev, v_prev = carry
        w = matvec(v)
        alpha = jnp.real(jnp.vdot(v, w)).astype(rdt)
        w = w - alpha * v - beta_prev * v_prev
        # full reorthogonalization (two passes for stability)
        for _ in range(2):
            overlaps = jnp.conj(V) @ w  # rows beyond j are zero vectors
            w = w - V.T @ overlaps
        beta = jnp.linalg.norm(w).astype(rdt)
        v_next = jnp.where(beta > 1e-14, w / jnp.maximum(beta, 1e-30), w * 0)
        V = jax.lax.cond(
            j + 1 < k,
            lambda V: V.at[j + 1].set(v_next),
            lambda V: V,
            V,
        )
        return (V, v_next, beta, v), (alpha, beta)

    (V, _, _, _), (alphas, betas) = jax.lax.scan(
        body, (V, v, jnp.zeros((), rdt), jnp.zeros_like(v)), jnp.arange(k)
    )
    return alphas, betas, V


def lanczos_eigsh(
    matvec,
    v0: jnp.ndarray,
    k: int = 80,
    n_eigen: int = 1,
) -> Tuple[np.ndarray, jnp.ndarray]:
    """Lowest ``n_eigen`` eigenpairs of the Hermitian operator ``matvec``.

    Returns (eigenvalues [np, ascending], eigenvectors [n_eigen, dim] jnp).
    """
    alphas, betas, V = _lanczos_basis(matvec, v0, k)
    alphas = np.asarray(alphas, dtype=np.float64)
    betas = np.asarray(betas, dtype=np.float64)
    # effective Krylov dimension (stop at breakdown)
    m = k
    for j in range(k - 1):
        if betas[j] < 1e-12:
            m = j + 1
            break
    T = np.diag(alphas[:m])
    if m > 1:
        off = betas[: m - 1]
        T += np.diag(off, 1) + np.diag(off, -1)
    evals, evecs = np.linalg.eigh(T)
    n_eigen = min(n_eigen, m)
    # Ritz vectors: combine on device
    Y = jnp.asarray(evecs[:, :n_eigen])  # (m, n_eigen)
    vecs = (V[:m].T @ Y.astype(V.dtype)).T  # (n_eigen, dim)
    norms = jnp.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs / norms
    return evals[:n_eigen], vecs


def ground_state(
    hamiltonian: PauliSum,
    n_qubits: int,
    n_electrons: int,
    spin_up: int,
    spin_down: int,
    k: int = None,
    dtype=jnp.complex128,
    seed: int = 7,
) -> Tuple[float, jnp.ndarray]:
    """Sector-restricted ground state (energy, full-space statevector).

    Parity with ``jw_get_ground_state``
    (/root/reference/linalg/exact_diagonalization.py:34-51).
    """
    dim_sector = sector_dimension(n_electrons, spin_up, n_qubits)
    if k is None:
        k = int(min(max(2 * dim_sector, 8), 160))
    k = min(k, max(dim_sector, 2))
    mv, idx = _sector_matvec(
        hamiltonian, n_qubits, n_electrons, spin_up, spin_down, dtype
    )
    kr, ki = jax.random.split(jax.random.PRNGKey(seed))
    rdt = real_dtype(dtype)
    v0 = (
        jax.random.normal(kr, (dim_sector,), dtype=rdt)
        + 1j * jax.random.normal(ki, (dim_sector,), dtype=rdt)
    ).astype(dtype)
    v0 = v0 / jnp.linalg.norm(v0)
    evals, vecs = lanczos_eigsh(mv, v0, k=k, n_eigen=1)
    full = jnp.zeros(1 << n_qubits, dtype=dtype).at[idx].set(vecs[0])
    return float(evals[0]), full


def degenerate_ground_space(
    hamiltonian: PauliSum,
    n_qubits: int,
    n_electrons: int,
    spin_up: int,
    spin_down: int,
    n_states: int = 4,
    degeneracy_tol: float = 1e-6,
    k: int = 220,
    dtype=jnp.complex128,
    seed: int = 7,
) -> Tuple[float, List[jnp.ndarray]]:
    """Lowest (possibly degenerate) ground subspace, orthonormalized.

    Parity with ``jw_get_ground_state_for_3x3``
    (/root/reference/linalg/exact_diagonalization.py:181-229), which keeps 4
    low states and Gram-Schmidts them.  A single Krylov sequence only ever
    finds one vector per degenerate eigenvalue, so here each additional state
    comes from a deflated restart: previously found eigenvectors are shifted
    upward inside the matvec, guaranteeing the full degenerate subspace.
    """
    dim_sector = sector_dimension(n_electrons, spin_up, n_qubits)
    k = min(k, dim_sector)
    mv, idx = _sector_matvec(
        hamiltonian, n_qubits, n_electrons, spin_up, spin_down, dtype
    )
    rdt = real_dtype(dtype)
    found: List[jnp.ndarray] = []  # sector-coordinate eigenvectors
    energies: List[float] = []
    shift = None
    for s in range(n_states):
        kr, ki = jax.random.split(jax.random.PRNGKey(seed + s))
        v0 = (
            jax.random.normal(kr, (dim_sector,), dtype=rdt)
            + 1j * jax.random.normal(ki, (dim_sector,), dtype=rdt)
        ).astype(dtype)
        for u in found:
            v0 = v0 - jnp.vdot(u, v0) * u
        v0 = v0 / jnp.linalg.norm(v0)
        if found:
            U = jnp.stack(found)
            sft = jnp.asarray(shift, dtype=dtype)

            def matvec(v, _U=U, _s=sft):
                w = mv(v)
                return w + _s * (_U.T @ (jnp.conj(_U) @ v))

        else:
            matvec = mv
        evals, vecs = lanczos_eigsh(matvec, v0, k=k, n_eigen=1)
        e, vec = float(evals[0]), vecs[0]
        if shift is None:
            shift = abs(e) * 10 + 10.0
        if energies and e > energies[0] + degeneracy_tol:
            break  # left the degenerate ground manifold
        # explicit Gram-Schmidt against found states (roundoff hygiene)
        for u in found:
            vec = vec - jnp.vdot(u, vec) * u
        vec = vec / jnp.linalg.norm(vec)
        found.append(vec)
        energies.append(e)
    full_states = [
        jnp.zeros(1 << n_qubits, dtype=dtype).at[idx].set(v) for v in found
    ]
    return energies[0], full_states
