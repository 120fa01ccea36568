"""Statevector creation and index utilities (single-shard view).

The statevector is a flat ``(2**n,)`` complex array.  Qubit ``q`` occupies
bit ``(n - 1 - q)`` of the flat index (qubit 0 = most significant), matching
the reference stack's OpenFermion/PennyLane indexing
(``/root/reference/linalg/exact_diagonalization.py:23``).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def bitpos(q: int, n: int) -> int:
    """Flat-index bit position of qubit q."""
    return n - 1 - q


def qmask_to_bmask(qmask: int, n: int) -> int:
    """Convert a qubit-indexed mask (bit q = qubit q) to a flat-index bitmask."""
    out = 0
    for q in range(n):
        if (qmask >> q) & 1:
            out |= 1 << (n - 1 - q)
    return out


def complex_dtype(dtype) -> jnp.dtype:
    dtype = jnp.dtype(dtype)
    if dtype in (jnp.complex64, jnp.complex128):
        return dtype
    raise ValueError(f"expected complex dtype, got {dtype}")


def real_dtype(cdtype) -> jnp.dtype:
    return jnp.zeros((), dtype=cdtype).real.dtype


def zero_state(n_qubits: int, dtype=jnp.complex128) -> jnp.ndarray:
    """|00...0> as a flat statevector."""
    psi = jnp.zeros(1 << n_qubits, dtype=dtype)
    return psi.at[0].set(1.0)


def basis_state(n_qubits: int, occupied_qubits, dtype=jnp.complex128) -> jnp.ndarray:
    """Computational basis state with the given qubits set to |1>."""
    index = 0
    for q in occupied_qubits:
        index |= 1 << bitpos(q, n_qubits)
    psi = jnp.zeros(1 << n_qubits, dtype=dtype)
    return psi.at[index].set(1.0)


def index_bits(n_qubits: int) -> jnp.ndarray:
    """Constant uint32 arange over the flat index space (for parity signs)."""
    if n_qubits > 32:
        raise ValueError("single-shard index space limited to 32 qubits")
    return jax.lax.iota(jnp.uint32, 1 << n_qubits)


def parity_signs(n_qubits: int, bmask: int, dtype) -> jnp.ndarray:
    """(-1)^{popcount(b & bmask)} over all flat indices b, as a real vector.

    Built from jitted elementwise ops (iota + popcount), so XLA fuses it into
    whatever consumes it -- no 2^n constant needs materializing on host.
    """
    idx = index_bits(n_qubits)
    par = jax.lax.population_count(idx & jnp.uint32(bmask)) & jnp.uint32(1)
    return (1.0 - 2.0 * par.astype(dtype))


def norm(psi: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(jnp.abs(psi) ** 2).real)


def fidelity(psi: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """|<psi|phi>|^2 (reference fidelity probe, /root/reference/models/hva.py:322)."""
    return jnp.abs(jnp.vdot(psi, phi)) ** 2


def subspace_fidelity(psi: jnp.ndarray, basis_states) -> jnp.ndarray:
    """Projection fidelity onto the span of orthonormal states.

    Degenerate ground-subspace fidelity for the 3x3 lattice
    (``/root/reference/models/hva_for_3x3.py:305-312``).
    """
    total = 0.0
    for phi in basis_states:
        total = total + jnp.abs(jnp.vdot(phi, psi)) ** 2
    return total
