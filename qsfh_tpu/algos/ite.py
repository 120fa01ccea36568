"""Imaginary-time evolution (ITE) ground-state solver.

A non-variational ground-state method to cross-check the VQE family: the
power-method flow ``|psi(beta)> ~ exp(-beta H)|psi0>`` converges to the
lowest eigenstate overlapping ``|psi0>`` (within the symmetry sector
``psi0`` lives in -- H conserves N and Sz, so a sector basis state stays
in its sector).  The reference framework has no counterpart; its ground
truths come from exact diagonalization only
(``/root/reference/linalg/exact_diagonalization.py``), which caps out far
below the statevector sizes the engine holds.  ITE needs only
matrix-free ``H|psi>`` applications, so it runs at every scale the
engine does -- sharded over a device mesh included.

TPU shape: each step applies a degree-``order`` Taylor polynomial of
``exp(-dbeta (H - E))`` via Horner-style accumulation of
``Observable.apply_auto`` passes (scan-lowered Pauli application, constant
program size), then renormalizes; a whole block of steps is one jitted
``lax.scan``.  The Rayleigh shift ``E = <H>`` recentres the polynomial
argument every step, and the recorded energy VARIANCE ``<H^2> - <H>^2``
(computed from the same ``H|psi>`` pass, no extra work) is a convergence
certificate ED-free callers can trust: variance -> 0 iff the state is an
eigenstate.

Stability: the Taylor polynomial only contracts eigencomponents with
``dbeta * (E_k - E) `` inside a bounded region, so ``dbeta`` must resolve
the spectral width.  :func:`suggest_dbeta` returns a rigorous choice from
the Pauli 1-norm bound ``||H - E|| <= sum_k |c_k|``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.expectation import Observable
from ..engine.state import from_reim, real_dtype, to_reim, to_reim_host
from ..ops.pauli import PauliSum
from .base import default_dtype

__all__ = ["ImaginaryTimeEvolution", "suggest_dbeta"]


def suggest_dbeta(op: PauliSum, safety: float = 0.5) -> float:
    """A stable imaginary-time step from the Pauli 1-norm spectral bound.

    ``|E_k - E| <= 2 * sum |c_k|`` for any Rayleigh shift E inside the
    spectrum, and the order>=2 Taylor polynomials of ``exp(-x)`` stay
    contracting for ``|x| <= ~1``; ``safety`` leaves margin.
    """
    c_abs = float(np.abs(op.c).sum())
    return safety / max(2.0 * c_abs, 1e-12)


class ImaginaryTimeEvolution:
    """Taylor-propagated ``exp(-beta H)`` flow for a :class:`HubbardProblem`
    (or any object exposing ``n_qubits`` and ``qubit_hamiltonian``).

    ``mesh``: optional :class:`jax.sharding.Mesh`; the statevector is
    amplitude-sharded and re-pinned every step (same contract as
    :class:`~qsfh_tpu.algos.dynamics.TrotterEvolution`).
    """

    def __init__(
        self,
        problem,
        dbeta: Optional[float] = None,
        order: int = 4,
        dtype=None,
        mesh=None,
    ):
        if order < 1:
            raise ValueError("Taylor order must be >= 1")
        self.problem = problem
        self.n_qubits = problem.n_qubits
        self.dtype = dtype or default_dtype()
        self.mesh = mesh
        self.order = int(order)
        ham = problem.qubit_hamiltonian
        self.observable = Observable(ham, self.n_qubits)
        self.dbeta = float(dbeta) if dbeta is not None else suggest_dbeta(ham)

    # -- one step (trace-time) ------------------------------------------------------

    def _step(self, psi):
        """One normalized Taylor step; returns (psi', energy, variance, logw).

        The energy/variance reported are those of the INPUT state (they
        reuse the same H|psi> pass that seeds the polynomial).  ``logw``
        is the log-norm of the UNNORMALIZED half-step,
        ``log || exp(-dbeta H) psi || = log ||acc|| - dbeta * E`` (the
        polynomial approximates ``exp(-dbeta (H - E))``), which thermal
        typicality accumulates into Boltzmann weights.
        """
        h_psi = self.observable.apply_auto(psi)
        energy = jnp.real(jnp.vdot(psi, h_psi))
        h2 = jnp.real(jnp.vdot(h_psi, h_psi))
        variance = h2 - energy * energy
        # accumulate  sum_j (-dbeta)^j / j! (H - E)^j |psi>
        term = psi
        acc = psi
        for j in range(1, self.order + 1):
            applied = h_psi if j == 1 else self.observable.apply_auto(term)
            term = (-self.dbeta / j) * (applied - energy * term)
            acc = acc + term
        nrm = jnp.sqrt(jnp.real(jnp.vdot(acc, acc)))
        logw = jnp.log(nrm) - self.dbeta * energy
        acc = acc / nrm
        if self.mesh is not None:
            from ..parallel.mesh import constrain_amp

            acc = constrain_amp(acc, self.mesh)
        return acc, energy, variance, logw

    # -- driver ---------------------------------------------------------------------

    def run(
        self,
        psi0,
        n_steps: int = 1000,
        block: int = 50,
        variance_tol: Optional[float] = None,
        verbose: bool = False,
    ):
        """Evolve exactly ``n_steps`` steps (in jitted blocks of ``block``
        scan steps, one compiled program reused across full blocks plus at
        most one shorter remainder program), stopping early when the energy
        variance drops below ``variance_tol``.

        Returns ``(psi_final, records)`` with host numpy ``energies`` and
        ``variances`` time series (one entry per executed step).  The jit
        boundary is complex-free (stacked real planes, engine/state.py).
        """

        def body(psi, _):
            psi, energy, variance, _logw = self._step(psi)
            return psi, (energy, variance)

        # at most two programs compile: the full block and one remainder
        block_fns = {}

        def run_len(psi_r, length):
            if length not in block_fns:
                @jax.jit
                def fn(psi_r):
                    psi = from_reim(psi_r, self.dtype)
                    psi, series = jax.lax.scan(body, psi, None, length=length)
                    return to_reim(psi), series

                block_fns[length] = fn
            return block_fns[length](psi_r)

        psi_r = jnp.asarray(to_reim_host(np.asarray(psi0), self.dtype))
        energies, variances = [], []
        executed = 0
        while executed < n_steps:
            blk = min(block, n_steps - executed)
            psi_r, (es, vs) = run_len(psi_r, blk)
            es, vs = np.asarray(es), np.asarray(vs)
            energies.append(es)
            variances.append(vs)
            executed += blk
            if verbose:
                print(
                    f"beta: {executed * self.dbeta:9.4f} | "
                    f"energy: {es[-1]: .8f} | variance: {vs[-1]:.3e}"
                )
            if variance_tol is not None and vs[-1] < variance_tol:
                break
        arr = np.asarray(psi_r)
        psi_final = arr[0] + 1j * arr[1]
        records = {
            "energies": np.concatenate(energies),
            "variances": np.concatenate(variances),
        }
        return psi_final, records

    # -- finite temperature (canonical typicality) -----------------------------------

    def thermal_expectation(
        self,
        beta: float,
        observables,
        n_samples: int = 16,
        key=None,
        sector=None,
    ):
        """Canonical thermal averages ``<O>_beta = Tr_S(e^{-beta H} O)/Z_S``
        by imaginary-time typicality.

        Each random vector ``|r>`` (Haar-Gaussian over the sector ``S``)
        is evolved to ``beta/2`` with the same Taylor stepper (one jitted
        scan, reused across samples); the accumulated log-weights
        ``w_r = ||e^{-beta H/2}|r>||^2`` are the stochastic Boltzmann
        weights, and

            <O>_beta  ~=  sum_r w_r <psi_r|O|psi_r> / sum_r w_r .

        ``sector`` defaults to the problem's pinned ``(N, N_up)`` sector
        (pass ``None`` explicitly via ``sector=False`` for the full
        space).  Returns ``(estimates, diagnostics)``: per-observable
        means plus jackknife standard errors and the log-weight spread
        (typicality error shrinks with both ``n_samples`` and the
        effective sector dimension).  Reference context: the reference
        framework computes ground states only; this unlocks temperature
        axes (e.g. double occupancy vs T across the Mott crossover).
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        n_half = max(int(round((beta / 2.0) / self.dbeta)), 1)
        beta_eff = 2.0 * n_half * self.dbeta
        obs = dict(observables)

        def body(carry, _):
            psi, logw = carry
            psi, _e, _v, lw = self._step(psi)
            return (psi, logw + lw), None

        @jax.jit
        def run_half(psi_r):
            psi = from_reim(psi_r, self.dtype)
            (psi, logw), _ = jax.lax.scan(
                body, (psi, jnp.zeros((), real_dtype(self.dtype))), None, length=n_half
            )
            vals = tuple(jnp.real(o.expectation(psi)) for o in obs.values())
            return to_reim(psi), logw, vals

        if sector is False:
            def draw(k):
                kr, ki = jax.random.split(k)
                dim = 1 << self.n_qubits
                rdt = real_dtype(self.dtype)
                rng_r = np.asarray(jax.random.normal(kr, (dim,), dtype=rdt))
                rng_i = np.asarray(jax.random.normal(ki, (dim,), dtype=rdt))
                v = rng_r + 1j * rng_i
                return v / np.linalg.norm(v)
        else:
            from ..linalg.sectors import random_sector_state

            if sector is None:
                p = self.problem
                sector = (p.n_electrons, p.n_spin_up)

            def draw(k):
                return np.asarray(
                    random_sector_state(
                        self.n_qubits, sector[0], sector[1], key=k, dtype=self.dtype
                    )
                )

        logws = np.zeros(n_samples)
        values = {name: np.zeros(n_samples) for name in obs}
        for r, k in enumerate(jax.random.split(key, n_samples)):
            psi0 = draw(k)
            _, logw, vals = run_half(jnp.asarray(to_reim_host(psi0, self.dtype)))
            logws[r] = 2.0 * float(logw)  # w_r = ||e^{-beta H/2} r||^2
            for name, v in zip(obs, vals):
                values[name][r] = float(v)

        w = np.exp(logws - logws.max())
        w_sum = w.sum()
        estimates = {name: float((w * v).sum() / w_sum) for name, v in values.items()}
        # jackknife standard errors over samples
        stderrs = {}
        for name, v in values.items():
            if n_samples > 1:
                jk = np.array([
                    ((w * v).sum() - w[i] * v[i]) / (w_sum - w[i])
                    for i in range(n_samples)
                ])
                stderrs[name] = float(np.sqrt((n_samples - 1) * np.var(jk)))
            else:
                stderrs[name] = float("nan")
        diagnostics = {
            "beta_effective": beta_eff,
            "n_samples": n_samples,
            "stderrs": stderrs,
            "log_weight_spread": float(logws.max() - logws.min()),
            "effective_samples": float(w_sum**2 / (w**2).sum()),
        }
        return estimates, diagnostics
