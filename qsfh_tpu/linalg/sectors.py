"""(N, Sz)-symmetry-sector utilities.

Replaces the combinatorial basis enumeration of
``/root/reference/linalg/exact_diagonalization.py:11-32`` and adds the
TPU-native formulation: sector *masks* computed elementwise from popcounts,
so projection onto a sector is one fused pass over the statevector instead
of a host-side index list.

Bit convention: statevector index ``b`` has qubit/mode ``q`` occupied iff bit
``(n_qubits - 1 - q)`` is set; spin-up lives on even modes.
"""

from __future__ import annotations

import itertools
from typing import List

import jax
import jax.numpy as jnp

from ..engine.state import index_bits, qmask_to_bmask, real_dtype


def jw_number_spin_indices(n_electrons: int, spin_up: int, spin_down: int, n_qubits: int) -> List[int]:
    """Statevector indices of the fixed (N, N_up) sector.

    Ordering matches the reference exactly (occupations enumerated
    lexicographically then reversed, exact_diagonalization.py:16-23) so the
    sector<->full-space embedding is bit-for-bit identical.
    """
    if spin_up + spin_down != n_electrons:
        raise ValueError("spin up plus spin down must equal to n_electrons!")
    new_occupations = []
    for occ in itertools.combinations(range(n_qubits), n_electrons):
        if sum(1 for p in occ if p % 2 == 0) == spin_up:
            new_occupations.append(occ)
    return [
        sum(1 << (n_qubits - n - 1) for n in occupation)
        for occupation in reversed(new_occupations)
    ]


def sector_dimension(n_electrons: int, spin_up: int, n_qubits: int) -> int:
    """Dimension of the (N, N_up) sector; spin-up lives on the even half."""
    from math import comb

    n_sites = n_qubits // 2
    spin_down = n_electrons - spin_up
    return comb(n_sites, spin_up) * comb(n_sites, spin_down)


def sector_mask(n_qubits: int, n_electrons: int, spin_up: int) -> jnp.ndarray:
    """Boolean mask over flat indices: membership in the (N, N_up) sector.

    Fused elementwise popcounts -- no host enumeration, works sharded.
    """
    idx = index_bits(n_qubits)
    even_qubits = sum(1 << q for q in range(0, n_qubits, 2))
    up_bmask = jnp.uint32(qmask_to_bmask(even_qubits, n_qubits))
    total = jax.lax.population_count(idx)
    ups = jax.lax.population_count(idx & up_bmask)
    return (total == n_electrons) & (ups == spin_up)


def project_to_sector(psi: jnp.ndarray, n_qubits: int, n_electrons: int, spin_up: int) -> jnp.ndarray:
    mask = sector_mask(n_qubits, n_electrons, spin_up)
    return jnp.where(mask, psi, 0.0)


def random_sector_state(
    n_qubits: int, n_electrons: int, spin_up: int, key=None, dtype=jnp.complex128
) -> jnp.ndarray:
    """Normalized random vector supported on the sector (Lanczos seed)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    kr, ki = jax.random.split(key)
    dim = 1 << n_qubits
    rdt = real_dtype(dtype)
    v = (
        jax.random.normal(kr, (dim,), dtype=rdt)
        + 1j * jax.random.normal(ki, (dim,), dtype=rdt)
    ).astype(dtype)
    v = project_to_sector(v, n_qubits, n_electrons, spin_up)
    return v / jnp.linalg.norm(v)
