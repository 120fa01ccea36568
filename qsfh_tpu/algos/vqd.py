"""Variational Quantum Deflation: excited states via overlap penalties.

Beyond the reference (which only ever targets ground states / ground
manifolds): level ``m`` minimizes

    L_m(theta) = <psi(theta)|H|psi(theta)>
                 + beta * sum_{i<m} |<psi_i|psi(theta)>|^2

(Higgott, Wang & Brierley, "Variational Quantum Computation of Excited
States", Quantum 3, 156 (2019)).  For ``beta`` larger than the spectral
spread the penalized minimum of level ``m`` is the (m+1)-th eigenstate.

Reuses the hardware-efficient ansatz (:func:`qsfh_tpu.algos.hea.hea_circuit`)
so it applies to molecules and lattice Hamiltonians alike; the exact
spectrum from :mod:`qsfh_tpu.linalg` is the validation golden
(tests/test_vqd.py).  Prior states enter the jitted loss as stacked real
``(2, 2^n)`` planes (no complex captures -- the TPU boundary rule,
engine/state.py).
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..engine.expectation import Observable
from ..engine.state import fidelity, from_reim, real_dtype, to_reim_host
from ..io import checkpoint as ckpt
from ..io.metrics import MetricsLogger
from ..ops.jw import jordan_wigner
from .base import default_dtype
from .hea import hea_circuit


class VQD:
    """Sequential deflation over ``n_levels`` eigenstates of a Hamiltonian.

    ``hamiltonian`` may be a FermionOperator, a PauliSum, or anything with
    ``get_molecular_hamiltonian()`` (a Molecule).  The spectrum is over the
    FULL Fock space (no sector restriction), matching dense
    diagonalization order.
    """

    def __init__(
        self,
        hamiltonian,
        n_qubits: Optional[int] = None,
        n_levels: int = 2,
        n_epoch: int = 300,
        reps: int = 3,
        lr: float = 1e-1,
        beta: float = 5.0,
        threshold: float = 1e-4,
        dtype=None,
        seed: int = 0,
        results_root: str = "./results",
        tag: str = "VQD",
        log_metrics: bool = True,
        penalty_ops=None,
        initial_occupied=None,
        init_scale: Optional[float] = None,
        circuit=None,
        init_params=None,
    ):
        """``penalty_ops``: optional list of ``(operator, target, weight)``
        adding ``weight * <(O - target)^2>`` to every level's loss --
        symmetry-sector targeting (e.g. pin particle number and Sz so the
        deflation walks the excited states of the PHYSICAL sector instead
        of the full Fock space).

        ``initial_occupied``: qubits set to |1> in the circuit's start
        state (default |0...0>) -- seeding inside the target sector makes
        sector-penalized lattice runs converge orders of magnitude faster
        than a random start from the vacuum.  With a seed the random
        parameter init shrinks to ``init_scale * pi`` (default 0.2) so the
        first iterate stays near the sector.

        ``circuit``/``init_params``: ansatz injection -- any traced
        ``circuit(params) -> psi`` plus its parameter init (a pytree or a
        ``callable(PRNGKey) -> pytree``) replaces the default HEA.
        Deflating a physics-aware ansatz (e.g. ``HVA.circuit``) confines
        the search to its conserved sector by construction, where the
        generic HEA must fight the full-Fock landscape (the 2x2 Hubbard
        sector is rough enough that penalized HEA plateaus ~200 mHa off)."""
        if hasattr(hamiltonian, "get_molecular_hamiltonian"):
            if n_qubits is None:
                n_qubits = hamiltonian.n_qubits
            hamiltonian = hamiltonian.get_molecular_hamiltonian()
        qubit_h = jordan_wigner(hamiltonian)
        if n_qubits is None:
            n_qubits = qubit_h.n_qubits()
        self.n_qubits = n_qubits
        self.observable = Observable(qubit_h, n_qubits)
        self.penalties = []
        for op, target, weight in penalty_ops or []:
            ps = jordan_wigner(op)
            from ..ops.pauli import PauliSum

            shifted = ps - PauliSum.identity(complex(target))
            self.penalties.append(
                (Observable((shifted * shifted).simplify(), n_qubits), float(weight))
            )
        self.n_levels = n_levels
        self.n_epoch = n_epoch
        self.reps = reps
        self.lr = lr
        self.beta = beta
        self.threshold = threshold
        self.dtype = dtype or default_dtype()
        self.seed = seed
        self.initial_occupied = (
            tuple(initial_occupied) if initial_occupied is not None else None
        )
        if init_scale is None:
            init_scale = 0.2 if initial_occupied is not None else 1.0
        self.init_scale = float(init_scale)
        self.circuit = circuit
        self.init_params = init_params

        self.energies: List[float] = []
        self.states: List[np.ndarray] = []  # converged level states (host)
        self.histories: List[List[float]] = []

        self.result_filepath = os.path.join(
            results_root, "vqe_results", f"{tag}-{n_qubits}q-reps{reps}.json"
        )
        self.metrics = MetricsLogger(
            self.result_filepath.replace(".json", ".jsonl") if log_metrics else None
        )

    # -- per-level training ------------------------------------------------------

    def _apply_circuit(self, params) -> jnp.ndarray:
        if self.circuit is not None:
            return self.circuit(params)
        psi0 = None
        if self.initial_occupied is not None:
            from ..engine.state import basis_state

            psi0 = basis_state(self.n_qubits, self.initial_occupied, dtype=self.dtype)
        return hea_circuit(params, self.n_qubits, self.reps, self.dtype, psi0=psi0)

    def _initial_params(self, key):
        if self.init_params is None:
            rdt = real_dtype(self.dtype)
            return (
                (2.0 * jax.random.uniform(key, (self.reps + 1, self.n_qubits, 3)) - 1.0)
                * np.pi * self.init_scale
            ).astype(rdt)
        if callable(self.init_params):
            return self.init_params(key)
        return jax.tree_util.tree_map(jnp.asarray, self.init_params)

    def _build_step(self, prior_reim: List[jnp.ndarray]):
        optimizer = optax.adam(self.lr)
        obs = self.observable
        beta = self.beta
        dtype = self.dtype
        sector = self.penalties

        def loss_fn(params):
            psi = self._apply_circuit(params)
            energy = obs.expectation(psi)
            penalty = 0.0
            for pr in prior_reim:
                penalty = penalty + beta * fidelity(psi, from_reim(pr, dtype))
            for p_obs, w in sector:
                penalty = penalty + w * p_obs.expectation(psi)
            return energy + penalty, energy

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def step(params, opt_state):
            (loss, energy), grads = grad_fn(params)
            gnorm = optax.global_norm(grads)
            updates, opt_state = optimizer.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, energy, gnorm

        return jax.jit(step), optimizer

    def run(self) -> List[float]:
        for level in range(len(self.energies), self.n_levels):
            key = jax.random.PRNGKey(self.seed + level)
            params = self._initial_params(key)
            prior = [jnp.asarray(to_reim_host(s, self.dtype)) for s in self.states]
            step, optimizer = self._build_step(prior)
            opt_state = optimizer.init(params)
            history: List[float] = []
            for i_epoch in range(self.n_epoch):
                params, opt_state, loss, energy, gnorm = step(params, opt_state)
                loss, energy, gnorm = float(loss), float(energy), float(gnorm)
                history.append(energy)
                if (i_epoch + 1) % 25 == 0:
                    self.metrics.log(
                        level=level, epoch=i_epoch + 1, loss=loss,
                        energy=energy, norm=gnorm,
                    )
                if gnorm < self.threshold:
                    break
            # evaluate <H> at the FINAL params: history entries are computed
            # at pre-update iterates, so history[-1] would be one optimizer
            # step behind the stored deflation state (and n_epoch=0 would
            # have no entry at all)
            psi = self._apply_circuit(params)
            e_final = float(self.observable.expectation(psi))
            self.states.append(np.asarray(psi))
            self.energies.append(e_final)
            self.histories.append(history)
            print(f"VQD level {level}: E = {e_final:.8f} ({len(history)} epochs)")
        ckpt.save_results(
            self.result_filepath,
            {"energies": self.energies, "histories": self.histories},
        )
        return self.energies
