"""Circuit building blocks shared by the algorithm drivers.

The reference emits PennyLane gate queues inside each driver's ``circuit``
method (``/root/reference/models/hva.py:273-303``).  Here circuits are plain
Python compositions of the fused engine kernels, traced once under ``jit``;
everything structural (masks, wire indices, Givens plans) is static at trace
time, and only rotation angles are traced.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fermion import FermionOperator
from ..ops.givens import Plan
from ..ops.jw import jordan_wigner
from . import gates
from .state import basis_state, const_complex as state_const_complex


def get_non_interacting_ground_state_indices(
    k_quadratic_term: FermionOperator, n_qubits: int, n_spin_up: int, n_spin_down: int
) -> Tuple[List[int], List[int]]:
    """Pick the lowest-energy momentum modes per spin sector.

    Parity with ``get_non_interacting_ground_state_index``
    (/root/reference/models/hva.py:97-115): reads the diagonal k-space
    hopping energies and returns the n_up / n_down lowest mode indices.
    """
    spin_up_energies = {x: 0.0 for x in range(0, n_qubits, 2)}
    spin_down_energies = {x: 0.0 for x in range(1, n_qubits, 2)}
    for term, coeff in k_quadratic_term.terms.items():
        index = term[0][0]
        if index % 2 == 0:
            spin_up_energies[index] = coeff.real
        else:
            spin_down_energies[index] = coeff.real
    spin_up_indices = sorted(spin_up_energies, key=spin_up_energies.get)[:n_spin_up]
    spin_down_indices = sorted(spin_down_energies, key=spin_down_energies.get)[:n_spin_down]
    return spin_up_indices, spin_down_indices


def slater_prep_state(
    n_qubits: int,
    occupied_modes: Sequence[int],
    diagonal: np.ndarray,
    decomposition: Plan,
    dtype=jnp.complex128,
) -> jnp.ndarray:
    """Prepare the Slater determinant via X + RZ(diag) + reversed Givens plan.

    Mirrors the reference state-prep block (/root/reference/models/hva.py:276-289).
    The result is a constant (no traced parameters), so drivers compute it
    once and reuse it every step.  Jitted as one program: eager per-gate
    dispatch costs a host->device round trip per rotation (~n^2/2 of them),
    which dominates on a remote-tunneled TPU.
    """

    def prep():
        psi = basis_state(n_qubits, occupied_modes, dtype=dtype)
        return apply_givens_network(psi, n_qubits, diagonal, decomposition)

    return jax.jit(prep)()


def slater_prep_reim(
    n_qubits: int,
    occupied_modes: Sequence[int],
    diagonal: np.ndarray,
    decomposition: Plan,
    dtype=jnp.complex128,
) -> jnp.ndarray:
    """Slater determinant in stacked (2, 2^n) real/imag form.

    The storable/closable representation for the complex-free jit ABI
    (see qsfh_tpu.engine.state): drivers keep this real array and rebuild
    the complex state with ``from_reim`` inside their jitted step.
    """
    from .state import to_reim

    def prep():
        psi = basis_state(n_qubits, occupied_modes, dtype=dtype)
        psi = apply_givens_network(psi, n_qubits, diagonal, decomposition)
        return to_reim(psi)

    # Pinned to the host CPU backend: this one-time prep used to dispatch a
    # fixed-hash program on the default (accelerator) device, which (a) a
    # tunneled compile service can permanently poison via its
    # failure-by-hash cache (see engine/state.py real_dtype) and (b) costs
    # such services ~2 min to compile (traced basis one-hot,
    # benchmarks/tpu_bisect_basis.jsonl).  Drivers re-upload the returned
    # host array into their own salted programs.
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None and jax.devices()[0].platform != "cpu":
        with jax.default_device(cpu):
            return jax.jit(prep)()
    return jax.jit(prep)()


_STATIC_RZ_LAYER_MAX_QUBITS = 22  # above this the 2^n host constant is too big


def apply_givens_network(
    psi: jnp.ndarray, n_qubits: int, diagonal: np.ndarray, decomposition: Plan
) -> jnp.ndarray:
    """RZ(angle(diagonal)) layer + reversed Givens-plan rotations.

    Used standalone by ADAPT, whose ansatz acts in k-space BEFORE this
    network transforms back to real space
    (/root/reference/models/adapt_vqe.py:343-354).

    All plan angles are static, so the RZ layer collapses to one
    elementwise phase multiply and each (SingleExcitation, RZ) pair to one
    constant 4x4 apply -- the network costs ~40% of the HLO equations of
    the naive gate stream (compile time on remote TPU backends scales with
    equation count).
    """
    angles = [float(np.angle(diagonal[i])) for i in range(n_qubits)]
    if n_qubits <= _STATIC_RZ_LAYER_MAX_QUBITS:
        phases = gates.static_rz_layer_phases(angles, n_qubits)
        psi = psi * state_const_complex(phases, psi.dtype)
    else:
        for i in range(n_qubits):
            psi = gates.rz(psi, n_qubits, angles[i], i)
    for parallel_ops in reversed(decomposition):
        for op in parallel_ops:
            if op == "pht":
                psi = gates.pauli_x(psi, n_qubits, n_qubits - 1)
            else:
                i, j, theta, phi = op
                M = gates.givens_plan_matrix(float(theta), float(phi))
                psi = gates.apply_two_qubit(psi, n_qubits, M, i, j)
    return psi


def apply_givens_network_adjoint(
    psi: jnp.ndarray, n_qubits: int, diagonal: np.ndarray, decomposition: Plan
) -> jnp.ndarray:
    """Inverse of :func:`apply_givens_network` (U_FT^dag).

    Used by the ADAPT screening pass to rotate ``H |psi_real>`` back into
    momentum space, where the pool generators act
    (/root/reference/models/adapt_vqe.py:336-341 appends the pool in k-space).
    Gates within one parallel layer act on disjoint wires, so only the layer
    order reverses.
    """
    for parallel_ops in decomposition:
        for op in reversed(parallel_ops):
            if op == "pht":
                psi = gates.pauli_x(psi, n_qubits, n_qubits - 1)
            else:
                i, j, theta, phi = op
                M = gates.givens_plan_matrix(float(theta), float(phi))
                psi = gates.apply_two_qubit(psi, n_qubits, M.conj().T, i, j)
    angles = [-float(np.angle(diagonal[i])) for i in range(n_qubits)]
    if n_qubits <= _STATIC_RZ_LAYER_MAX_QUBITS:
        phases = gates.static_rz_layer_phases(angles, n_qubits)
        psi = psi * state_const_complex(phases, psi.dtype)
    else:
        for i in range(n_qubits):
            psi = gates.rz(psi, n_qubits, angles[i], i)
    return psi


class GeneratorGate:
    """A Trotterized exp(-i theta G) gate with host-precomputed rotation terms.

    Serializable descriptor (the FermionOperator source) + lowered rotation
    list; this replaces the reference's pickled ``functools.partial`` gate
    closures (/root/reference/models/adapt_vqe.py:144).
    """

    def __init__(self, generator, n_qubits: int, label: str = ""):
        if isinstance(generator, FermionOperator):
            qubit_gen = jordan_wigner(generator)
        else:
            qubit_gen = generator
        self.fermion_generator = generator if isinstance(generator, FermionOperator) else None
        self.generator = qubit_gen
        self.n_qubits = n_qubits
        self.label = label
        self.rot_terms = qubit_gen.rotation_terms()

    def __call__(self, psi: jnp.ndarray, theta) -> jnp.ndarray:
        return gates.generator_rotation(psi, self.n_qubits, self.rot_terms, theta)
