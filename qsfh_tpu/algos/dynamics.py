"""Real-time Trotter dynamics of the Fermi-Hubbard model.

The repo's namesake capability the reference never shipped: quench
dynamics ``|psi(t)> = exp(-i H t) |psi0>`` via first- or second-order
(Strang) Trotterization over the SAME commuting structure the HVA ansatz
uses (ops/hva.py bond coloring: terms inside one color class commute, so
each class is one exact fused rotation pass; the Coulomb layer is one
diagonal pass).  Exact coefficient relations (pinned by
tests/test_dynamics.py):

    H_hop = -t * sum(color-class generators)        (exactly)
    diag(JW(U-term)) = coulomb_diagonal + const     (const -> global phase)

The dropped constant only produces a global phase, so all observables
are exact up to the Trotter error.

TPU shape: one ``lax.scan`` over steps inside a single jit -- constant
program size in the number of steps, the same program form the compiled
HVA circuit uses (algos/hva.py:hva_program_rot).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.expectation import Observable
from ..engine.gates import diagonal_rotation, generator_rotation
from ..engine.state import from_reim, real_dtype, to_reim, to_reim_host
from .base import default_dtype


def neel_occupied(nx: int, ny: int):
    """Neel (antiferromagnetic) product-state orbitals: spin-up on the
    (x+y)-even checkerboard sites, spin-down on the odd ones (row-major
    sites, up on even JW modes).  On odd lattices (e.g. 3x3) this lands
    exactly in the ceil/floor half-filling sector the flagship demos use.
    Single source of truth for the CLI, demos, and benchmarks."""
    occ = []
    for s in range(nx * ny):
        x, y = s % nx, s // nx
        occ.append(2 * s if (x + y) % 2 == 0 else 2 * s + 1)
    return tuple(occ)


class TrotterEvolution:
    """Fixed-step real-time propagator for a :class:`HubbardProblem`.

    ``mesh``: optional :class:`jax.sharding.Mesh` -- the statevector is
    amplitude-sharded over it (parallel/mesh.py) and every Trotter step
    re-pins the sharding, so the GSPMD partitioner keeps the trajectory
    distributed and lowers cross-shard bit flips to collective permutes.
    Real-time dynamics thus scales over the same mesh axis as the
    variational drivers (the reference has neither).
    """

    def __init__(self, problem, dt: float, order: int = 2, dtype=None, mesh=None):
        if order not in (1, 2):
            raise ValueError("order must be 1 (Lie) or 2 (Strang)")
        self.problem = problem
        self.dt = float(dt)
        self.order = order
        self.dtype = dtype or default_dtype()
        self.n_qubits = problem.n_qubits
        self.mesh = mesh

        h_rots, v_rots = problem.hva_generators()
        self._groups = [g.rotation_terms() for g in (h_rots + v_rots)]
        # REAL dtype: a complex 2^n closure constant would violate the
        # complex-free jit ABI of the axon TPU backend (engine/state.py)
        self._coulomb_diag = problem.coulomb_diagonal(dtype=real_dtype(self.dtype))
        self._t = float(problem.tunneling)

    # -- single step --------------------------------------------------------------

    def _half_sweep(self, psi, dt, reverse: bool):
        """Coulomb then hopping classes (or the exact reverse order)."""
        seq = list(range(len(self._groups)))
        if not reverse:
            psi = diagonal_rotation(psi, self._coulomb_diag, dt)
            for i in seq:
                psi = generator_rotation(psi, self.n_qubits, self._groups[i], -self._t * dt)
        else:
            for i in reversed(seq):
                psi = generator_rotation(psi, self.n_qubits, self._groups[i], -self._t * dt)
            psi = diagonal_rotation(psi, self._coulomb_diag, dt)
        return psi

    def step(self, psi: jnp.ndarray) -> jnp.ndarray:
        """One Trotter step of ``dt`` (trace-time; jit via evolve())."""
        if self.order == 1:
            return self._half_sweep(psi, self.dt, reverse=False)
        psi = self._half_sweep(psi, self.dt / 2.0, reverse=False)
        return self._half_sweep(psi, self.dt / 2.0, reverse=True)

    # -- trajectory ---------------------------------------------------------------

    def evolve(
        self,
        psi0: jnp.ndarray,
        n_steps: int,
        observables: Optional[Dict[str, Observable]] = None,
    ):
        """Propagate ``n_steps`` and record observables after every step.

        Returns ``(psi_final, records)`` where ``records[name]`` is the
        length-``n_steps`` time series (f64/f32 real expectation values)
        and ``psi_final`` is a host numpy complex vector.  One jitted
        ``lax.scan`` -- program size independent of n_steps.  The jit
        boundary is complex-free (stacked real ``(2, 2^n)`` planes in and
        out -- the axon TPU ABI, engine/state.py); ``psi0`` must therefore
        be host-fetchable (build initial states on the CPU device).
        """
        obs = observables or {}
        constrain = None
        if self.mesh is not None:
            from ..parallel.mesh import constrain_amp

            constrain = lambda psi: constrain_amp(psi, self.mesh)

        def body(psi, _):
            psi = self.step(psi)
            if constrain is not None:
                psi = constrain(psi)
            vals = tuple(o.expectation(psi) for o in obs.values())
            return psi, vals

        @jax.jit
        def run(psi_r):
            psi = from_reim(psi_r, self.dtype)
            psi_final, series = jax.lax.scan(body, psi, None, length=n_steps)
            return to_reim(psi_final), series

        psi0_r = jnp.asarray(to_reim_host(np.asarray(psi0), self.dtype))
        psi_final_r, series = run(psi0_r)
        arr = np.asarray(psi_final_r)
        psi_final = arr[0] + 1j * arr[1]
        records = {
            name: np.asarray(series[i]) for i, name in enumerate(obs.keys())
        }
        return psi_final, records
