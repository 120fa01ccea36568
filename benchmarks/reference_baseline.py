"""Reference-equivalent baseline: torch-CPU gate-by-gate ADAPT train step.

The reference publishes no numbers (BASELINE.md) and its stack
(PennyLane default.qubit.torch + backprop, /root/reference/models/
adapt_vqe.py:299-304) cannot run in this image (no pennylane/openfermion).
This script reproduces the reference's per-iteration computational
structure faithfully so its wall-clock can be measured on the same host:

* statevector = torch complex128 tensor (PennyLane's torch backend dtype)
* every exp(-i theta/2 P) emitted as the reference's PauliStringRotation
  decomposition (/root/reference/models/utils.py:58-83): basis change
  (RX(+-pi/2)/Hadamard) + CNOT parity ladder + RZ + uncompute, each gate a
  separate full-statevector tensor op
* the ADAPT circuit: X-init, k-space ansatz gates, RZ+Givens FT network
  (adapt_vqe.py:343-354)
* loss = <H> via per-term Pauli expectations (qml.Hamiltonian style),
  backprop through the whole circuit, one Adam step

Usage:  python benchmarks/reference_baseline.py [Nx Ny n_ansatz n_iters]
Writes benchmarks/baseline_measurements.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import torch

torch.set_num_threads(os.cpu_count() or 8)

CDTYPE = torch.complex128


def apply_1q(psi: torch.Tensor, n: int, U: torch.Tensor, q: int) -> torch.Tensor:
    A, C = 1 << q, 1 << (n - 1 - q)
    t = psi.reshape(A, 2, C)
    return torch.einsum("xi,aic->axc", U, t).reshape(-1)


def apply_2q(psi: torch.Tensor, n: int, U: torch.Tensor, qa: int, qb: int) -> torch.Tensor:
    U = U.reshape(2, 2, 2, 2)
    if qa > qb:
        U = U.permute(1, 0, 3, 2)
        qa, qb = qb, qa
    A = 1 << qa
    B = 1 << (qb - qa - 1)
    C = 1 << (n - 1 - qb)
    t = psi.reshape(A, 2, B, 2, C)
    return torch.einsum("xyij,aibjc->axbyc", U, t).reshape(-1)


def _const(mat):
    return torch.tensor(mat, dtype=CDTYPE)


H_GATE = _const(np.array([[1, 1], [1, -1]]) / math.sqrt(2))
X_GATE = _const(np.array([[0, 1], [1, 0]]))
CNOT = _const(
    np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]])
)


def rx_gate(theta):
    c = torch.cos(theta / 2)
    s = torch.sin(theta / 2)
    return torch.stack(
        [torch.stack([c + 0j, -1j * s]), torch.stack([-1j * s, c + 0j])]
    ).to(CDTYPE)


def rz_gate(phi):
    e = torch.exp(-0.5j * phi.to(CDTYPE))
    z = torch.zeros((), dtype=CDTYPE)
    return torch.stack([torch.stack([e, z]), torch.stack([z, e.conj()])])


def pauli_string_rotation(psi, n, theta, pauli):
    """Reference PauliStringRotation (utils.py:58-83): basis change + CNOT
    ladder + RZ(theta) + uncompute, one tensor op per gate."""
    qubits = [q for q, _ in pauli]
    # basis change
    for q, p in pauli:
        if p == "X":
            psi = apply_1q(psi, n, H_GATE, q)
        elif p == "Y":
            psi = apply_1q(psi, n, rx_gate(torch.tensor(math.pi / 2)), q)
    for a, b in zip(qubits[:-1], qubits[1:]):
        psi = apply_2q(psi, n, CNOT, a, b)
    psi = apply_1q(psi, n, rz_gate(theta), qubits[-1])
    for a, b in reversed(list(zip(qubits[:-1], qubits[1:]))):
        psi = apply_2q(psi, n, CNOT, a, b)
    for q, p in pauli:
        if p == "X":
            psi = apply_1q(psi, n, H_GATE, q)
        elif p == "Y":
            psi = apply_1q(psi, n, rx_gate(torch.tensor(-math.pi / 2)), q)
    return psi


def single_excitation(psi, n, phi, qa, qb):
    c = torch.cos(phi / 2).to(CDTYPE)
    s = torch.sin(phi / 2).to(CDTYPE)
    one = torch.ones((), dtype=CDTYPE)
    zero = torch.zeros((), dtype=CDTYPE)
    U = torch.stack(
        [
            torch.stack([one, zero, zero, zero]),
            torch.stack([zero, c, -s, zero]),
            torch.stack([zero, s, c, zero]),
            torch.stack([zero, zero, zero, one]),
        ]
    )
    return apply_2q(psi, n, U, qa, qb)


def pauli_expectation(psi, n, terms):
    """<H> summed per term (qml.Hamiltonian-style measurement)."""
    total = torch.zeros((), dtype=torch.float64)
    for pauli, coeff in terms:
        phi = psi
        for q, p in pauli:
            if p == "X":
                phi = apply_1q(phi, n, X_GATE, q)
            elif p == "Y":
                phi = apply_1q(phi, n, _const(np.array([[0, -1j], [1j, 0]])), q)
            else:
                phi = apply_1q(phi, n, _const(np.array([[1, 0], [0, -1]])), q)
        total = total + coeff * torch.real(torch.vdot(psi, phi))
    return total


def paulisum_to_torch_terms(op):
    out = []
    for label, coeff in op.to_terms():
        pauli = []
        for token in label.split():
            pauli.append((int(token[1:]), token[0]))
        if pauli:
            out.append((pauli, float(coeff.real)))
    return out


def measure(Nx=3, Ny=3, n_ansatz=12, n_iters=3):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from qsfh_tpu.algos.base import HubbardProblem
    from qsfh_tpu.ops.jw import jordan_wigner
    from qsfh_tpu.ops.pool import hubbard_interaction_pool_simplified

    n_e = Nx * Ny
    n_up = (n_e + 1) // 2
    problem = HubbardProblem(Nx, Ny, 1.0, 6.0, n_e, n_up, n_e - n_up)
    n = problem.n_qubits
    ham_terms = paulisum_to_torch_terms(problem.qubit_hamiltonian)
    pool = hubbard_interaction_pool_simplified(Nx, Ny)[:n_ansatz]
    ansatz_terms = [paulisum_to_torch_terms(jordan_wigner(g)) for g in pool]

    occupied = problem.spin_up_indices + problem.spin_down_indices
    diag_angles = [float(np.angle(problem.diagonal[i])) for i in range(n)]
    givens = list(reversed(problem.decomposition))

    thetas = torch.nn.Parameter(0.05 * torch.ones(n_ansatz, dtype=torch.float64))
    opt = torch.optim.Adam([thetas], lr=1e-2)

    def circuit():
        psi = torch.zeros(1 << n, dtype=CDTYPE)
        idx = 0
        for q in occupied:
            idx |= 1 << q
        # bit convention irrelevant for timing; X-init as amplitude set
        psi[idx] = 1.0
        for k, terms in enumerate(ansatz_terms):
            for pauli, coeff in terms:
                psi = pauli_string_rotation(
                    psi, n, 2 * thetas[k] * coeff, pauli
                )
        for i in range(n):
            psi = apply_1q(psi, n, rz_gate(torch.tensor(diag_angles[i])), i)
        for layer in givens:
            for op in layer:
                if op == "pht":
                    psi = apply_1q(psi, n, X_GATE, n - 1)
                else:
                    i, j, th, ph = op
                    psi = single_excitation(psi, n, torch.tensor(2 * float(th)), i, j)
                    psi = apply_1q(psi, n, rz_gate(torch.tensor(float(ph))), j)
        return psi

    times = []
    for it in range(n_iters):
        t0 = time.time()
        opt.zero_grad()
        psi = circuit()
        loss = pauli_expectation(psi, n, ham_terms)
        loss.backward()
        opt.step()
        times.append(time.time() - t0)
        print(f"iter {it}: {times[-1]:.2f}s loss {float(loss):.6f}", flush=True)
    return {
        "config": {"Nx": Nx, "Ny": Ny, "n_qubits": 2 * Nx * Ny, "n_ansatz": n_ansatz},
        "sec_per_iter": float(np.median(times)),
        "note": (
            "torch-CPU complex128 gate-by-gate ADAPT train step emulating "
            "default.qubit.torch backprop (PauliStringRotation decomposition)"
        ),
    }


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    result = measure(*args) if args else measure()
    out = os.path.join(os.path.dirname(__file__), "baseline_measurements.json")
    data = {}
    if os.path.exists(out):
        data = json.load(open(out))
    key = f"adapt_step_{result['config']['n_qubits']}q"
    data[key] = result
    json.dump(data, open(out, "w"), indent=2)
    print(json.dumps(result))
