"""Hardware-efficient-ansatz VQE for molecules.

TPU-native rebuild of ``/root/reference/models/vqe_hea.py`` (class VQE :13):
``reps`` layers of per-qubit RX/RY/RZ + ring CNOTs, Adam, grad-norm early
stop, tracked against the FCI energy.

One deliberate fix: the reference's final rotation layer re-applies row
``reps-1`` of the parameter tensor, leaving the allocated row ``reps``
unused (``vqe_hea.py:53-55``, flagged in SURVEY.md C14).  Here the final
layer uses its own row ``reps`` as the allocation intends.

The three rotations per qubit are composed into ONE 2x2 unitary on the
host-traced side (Rz·Ry·Rx), so each qubit costs a single fused
matrix-apply pass instead of three.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..engine.expectation import Observable
from ..engine.gates import apply_one_qubit, cnot
from ..engine.state import real_dtype, zero_state
from ..io import checkpoint as ckpt
from ..io.metrics import MetricsLogger
from ..ops.jw import jordan_wigner
from .base import default_dtype


def _u3(rx, ry, rz, dtype):
    """Rz(rz) @ Ry(ry) @ Rx(rx) as a single traced 2x2 unitary."""
    cx, sx = jnp.cos(rx / 2), jnp.sin(rx / 2)
    cy, sy = jnp.cos(ry / 2), jnp.sin(ry / 2)
    Rx = jnp.array([[cx, -1j * sx], [-1j * sx, cx]], dtype=dtype)
    Ry = jnp.array([[cy, -sy], [sy, cy]], dtype=dtype)
    ez = jnp.exp(-1j * rz / 2)
    Rz = jnp.array([[ez, 0], [0, jnp.conj(ez)]], dtype=dtype)
    return Rz @ Ry @ Rx


def hea_circuit(params, n_qubits: int, reps: int, dtype, psi0=None) -> jnp.ndarray:
    """``reps`` layers of fused per-qubit u3 + ring CNOTs, then a final u3
    layer using its own parameter row (the reference's off-by-one fixed).
    Shared by the HEA VQE and the VQD excited-state driver; ``psi0``
    overrides the |0...0> start (e.g. a sector basis state)."""
    n = n_qubits
    psi = zero_state(n, dtype=dtype) if psi0 is None else psi0
    for rep in range(reps):
        for q in range(n):
            psi = apply_one_qubit(
                psi, n,
                _u3(params[rep, q, 0], params[rep, q, 1], params[rep, q, 2], dtype),
                q,
            )
        for q in range(n):
            psi = cnot(psi, n, q, (q + 1) % n)
    for q in range(n):
        psi = apply_one_qubit(
            psi, n,
            _u3(params[reps, q, 0], params[reps, q, 1], params[reps, q, 2], dtype),
            q,
        )
    return psi


class VQE:
    def __init__(
        self,
        molecule,
        n_epoch: int,
        reps: int,
        lr: float,
        threshold: float,
        dtype=None,
        seed: int = 0,
        results_root: str = "./results",
        plot: bool = True,
        log_metrics: bool = True,
    ):
        self.molecule = molecule
        self.n_epoch = n_epoch
        self.reps = reps
        self.lr = lr
        self.threshold = threshold
        self.plot = plot
        self.dtype = dtype or default_dtype()

        self.n_qubits = molecule.n_qubits
        self.n_electrons = molecule.n_electrons
        self.n_orbitals = molecule.n_orbitals

        qubit_h = jordan_wigner(molecule.get_molecular_hamiltonian())
        self.observable = Observable(qubit_h, self.n_qubits)

        rdt = real_dtype(self.dtype)
        # random +-pi init (vqe_hea.py:39)
        key = jax.random.PRNGKey(seed)
        self.params = (
            (2.0 * jax.random.uniform(key, (reps + 1, self.n_qubits, 3)) - 1.0) * np.pi
        ).astype(rdt)
        self.loss_history = []

        mol_name = getattr(molecule, "name", type(molecule).__name__)
        tag = f"HEA-{mol_name}-{self.n_qubits}q-reps{reps}"
        self.img_filepath = f"./images/{tag}.png"
        self.result_filepath = os.path.join(results_root, "vqe_results", tag + ".json")
        self.metrics = MetricsLogger(
            os.path.join(results_root, "vqe_results", tag + ".jsonl")
            if log_metrics
            else None
        )
        self._step = self._build_step()

    # -- circuit ----------------------------------------------------------------

    def circuit(self, params) -> jnp.ndarray:
        return hea_circuit(params, self.n_qubits, self.reps, self.dtype)

    # -- training ------------------------------------------------------------------

    def _build_step(self):
        optimizer = optax.adam(self.lr)
        self.optimizer = optimizer

        def loss_fn(params):
            return self.observable.expectation(self.circuit(params))

        grad_fn = jax.value_and_grad(loss_fn)

        def step(params, opt_state):
            energy, grads = grad_fn(params)
            gnorm = jnp.linalg.norm(grads)
            updates, opt_state = optimizer.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, energy, gnorm

        return jax.jit(step)

    def run(self):
        opt_state = self.optimizer.init(self.params)
        start = time.time()
        for i_epoch in range(self.n_epoch):
            self.params, opt_state, e, gnorm = self._step(self.params, opt_state)
            e, gnorm = float(e), float(gnorm)
            self.loss_history.append(e)
            if (i_epoch + 1) % 5 == 0:
                self.metrics.log(epoch=i_epoch + 1, loss=e, norm=gnorm)
            if gnorm < self.threshold:
                print(
                    f"gradient norm is less than threshold {self.threshold}, break the loop!"
                )
                break
        print(f"total evaluation time: {time.time() - start}s")
        ckpt.save_results(self.result_filepath, {"loss": self.loss_history})
        if self.plot and self.molecule.fci_energy is not None:
            from ..io.metrics import plot_energy_fidelity

            plot_energy_fidelity(
                self.img_filepath,
                self.loss_history,
                [0.0] * len(self.loss_history),
                self.molecule.fci_energy,
                label="hea",
                xlabel="epoch",
            )
        return self.loss_history


if __name__ == "__main__":
    # reference __main__ config (/root/reference/models/vqe_hea.py:103-108)
    from ..molecules import H2

    molecule = H2(r=0.8)
    vqe = VQE(molecule, n_epoch=100, reps=5, lr=1e-1, threshold=0.002)
    vqe.run()
