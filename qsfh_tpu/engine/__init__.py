from .circuits import (
    GeneratorGate,
    apply_givens_network,
    apply_givens_network_adjoint,
    get_non_interacting_ground_state_indices,
    slater_prep_reim,
    slater_prep_state,
)
from .compiled import CompiledCircuit, givens_network_static_ops, xor_flip_traced
from .expectation import Observable, PackedPool
from .gates import (
    apply_one_qubit,
    apply_pauli_string,
    apply_two_qubit,
    diagonal_rotation,
    generator_rotation,
    pauli_rotation,
)
from .state import (
    as_device_complex,
    basis_state,
    const_complex,
    fidelity,
    from_reim,
    subspace_fidelity,
    to_reim,
    to_reim_host,
    zero_state,
)

__all__ = [
    "GeneratorGate",
    "apply_givens_network",
    "apply_givens_network_adjoint",
    "get_non_interacting_ground_state_indices",
    "slater_prep_reim",
    "slater_prep_state",
    "CompiledCircuit",
    "givens_network_static_ops",
    "xor_flip_traced",
    "Observable",
    "PackedPool",
    "apply_one_qubit",
    "apply_pauli_string",
    "apply_two_qubit",
    "diagonal_rotation",
    "generator_rotation",
    "pauli_rotation",
    "as_device_complex",
    "basis_state",
    "const_complex",
    "fidelity",
    "from_reim",
    "subspace_fidelity",
    "to_reim",
    "to_reim_host",
    "zero_state",
]
