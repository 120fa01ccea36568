"""Gate-level circuit export / interop helpers.

Native equivalents of the reference's Qiskit helper path
(``/root/reference/models/utils.py:11`` ``QubitOperator_to_SparsePauliOp``,
``:85`` ``processPauliString``, ``:106`` ``exponentialPauliString``): a
sparse-list operator export, the rotation-angle preprocessing, and the
explicit basis-change + CNOT-ladder + RZ decomposition of exp(-i theta P/2)
— the decomposition the engine's fused matrix-free ``pauli_rotation`` kernel
replaces on TPU, emitted here as a portable gate plan for gate-level
hardware/interop, plus an OpenQASM 2.0 writer (no qiskit dependency; the
optional ``to_sparse_pauli_op`` builds a real ``SparsePauliOp`` when qiskit
is importable).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from .pauli import PauliSum

Gate = Tuple[str, Tuple[int, ...], float]  # (name, wires, param; 0.0 if none)


def to_sparse_list(op: PauliSum) -> List[Tuple[str, List[int], complex]]:
    """PauliSum -> [(pauli_letters, qubit_indices, coeff)] sparse triplets.

    The output is ``SparsePauliOp.from_sparse_list`` input (the reference
    builds exactly this list, models/utils.py:13-24), with coefficients in
    the Hermitian Y-string convention.
    """
    out = []
    for s, c in op.to_terms():
        letters = ""
        idx: List[int] = []
        for token in s.split():
            letters += token[0]
            idx.append(int(token[1:]))
        out.append((letters, idx, complex(c)))
    return out


def to_sparse_pauli_op(op: PauliSum, num_qubits: int):
    """Build a qiskit ``SparsePauliOp`` (requires qiskit at call time).

    Parity: ``QubitOperator_to_SparsePauliOp`` (models/utils.py:11-28).
    """
    try:
        from qiskit.quantum_info import SparsePauliOp  # type: ignore
    except ImportError as e:  # pragma: no cover - qiskit not in image
        raise ImportError(
            "qiskit is not installed; use to_sparse_list() for the "
            "framework-neutral sparse-triplet export"
        ) from e
    return SparsePauliOp.from_sparse_list(to_sparse_list(op), num_qubits=num_qubits)


def process_pauli_strings(
    op: PauliSum,
) -> Tuple[List[Tuple[List[str], List[int]]], List[float]]:
    """Split an anti-Hermitian generator into (strings, angle scales).

    Parity: ``processPauliString`` (models/utils.py:85-104) — each term's
    rotation angle scale is ``(coeff * 2j).real`` (the reference consumes
    i*real generators, so coefficients are pure imaginary).
    """
    strings: List[Tuple[List[str], List[int]]] = []
    coeffs: List[float] = []
    for letters, idx, c in to_sparse_list(op):
        if not idx:
            # identity: a global phase no rotation can express; skipped, like
            # rotation_terms()/Trotterize_generator (the reference's qiskit
            # path would emit a 0-qubit circuit here)
            continue
        strings.append((list(letters), idx))
        coeffs.append(float((c * 2j).real))
    return strings, coeffs


def pauli_rotation_gates(
    theta: float, pauli_string: Tuple[Sequence[str], Sequence[int]]
) -> List[Gate]:
    """Gate plan for exp(-i theta P / 2): the reference's decomposition.

    Mirrors ``PauliStringRotation``/``exponentialPauliString``
    (models/utils.py:58-83,106-137): RY(-pi/2)/RX(pi/2) basis changes, a
    CNOT parity ladder down to the last wire, RZ(theta), then uncompute.
    """
    paulis, wires = list(pauli_string[0]), list(pauli_string[1])
    if len(paulis) != len(wires) or not wires:
        raise ValueError("pauli_string must be (letters, wires) of equal length >= 1")
    ops: List[Gate] = []
    for p, q in zip(paulis, wires):
        if p == "X":
            ops.append(("ry", (q,), -np.pi / 2))
        elif p == "Y":
            ops.append(("rx", (q,), np.pi / 2))
        elif p != "Z":
            raise ValueError(f"bad Pauli letter: {p}")
    for q, q_next in zip(wires[:-1], wires[1:]):
        ops.append(("cx", (q, q_next), 0.0))
    ops.append(("rz", (wires[-1],), float(theta)))
    for q, q_next in zip(reversed(wires[:-1]), reversed(wires[1:])):
        ops.append(("cx", (q, q_next), 0.0))
    for p, q in zip(paulis, wires):
        if p == "X":
            ops.append(("ry", (q,), np.pi / 2))
        elif p == "Y":
            ops.append(("rx", (q,), -np.pi / 2))
    return ops


def generator_rotation_gates(theta: float, generator: PauliSum) -> List[Gate]:
    """Gate plan for first-order-Trotter exp(-i theta * G), G Hermitian.

    The export analog of the drivers' ``Trotterize_generator``
    (models/hva.py:84-95): one ``pauli_rotation_gates`` block per non-identity
    term with angle ``2 * theta * Re(coeff)`` — identical unitary to the
    engine's fused ``generator_rotation``, guaranteed by consuming the SAME
    ``rotation_terms()`` list the engine does.
    """
    ops: List[Gate] = []
    for x, z, scale in generator.rotation_terms():
        letters, wires = _mask_string(x, z)
        ops.extend(pauli_rotation_gates(2.0 * theta * scale, (letters, wires)))
    return ops


def _mask_string(x: int, z: int) -> Tuple[List[str], List[int]]:
    """Packed (x, z) masks -> (pauli letters, qubit indices), Y-string form."""
    letters: List[str] = []
    wires: List[int] = []
    q = 0
    m = x | z
    while m >> q:
        bx, bz = (x >> q) & 1, (z >> q) & 1
        if bx and bz:
            letters.append("Y")
        elif bx:
            letters.append("X")
        elif bz:
            letters.append("Z")
        if bx or bz:
            wires.append(q)
        q += 1
    return letters, wires


def to_qasm2(ops: Sequence[Gate], n_qubits: int) -> str:
    """Serialize a gate plan to OpenQASM 2.0 (ry/rx/rz/cx only)."""
    lines = [
        "OPENQASM 2.0;",
        'include "qelib1.inc";',
        f"qreg q[{n_qubits}];",
    ]
    for name, wires, param in ops:
        if name == "cx":
            lines.append(f"cx q[{wires[0]}],q[{wires[1]}];")
        elif name in ("rx", "ry", "rz"):
            lines.append(f"{name}({float(param)!r}) q[{wires[0]}];")
        else:
            raise ValueError(f"unknown gate: {name}")
    return "\n".join(lines) + "\n"
