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

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.expectation import Observable
from ..engine.gates import diagonal_rotation, generator_rotation
from ..engine.state import from_reim, real_dtype, to_reim, to_reim_host
from ..ops.fermion import FermionOperator
from ..ops.jw import jordan_wigner
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
        # the Coulomb layer drops JW(H)'s identity component, so the
        # propagator implements exp(-i (H - energy_shift) t): a GLOBAL
        # phase, invisible to expectation values but essential when
        # overlapping against fixed references (Green's functions)
        self.energy_shift = float(problem.qubit_hamiltonian.constant().real)

    # -- single step --------------------------------------------------------------

    def _half_sweep(self, psi, dt, reverse: bool, t_scale=None, u_scale=None):
        """Coulomb then hopping classes (or the exact reverse order).

        ``t_scale``/``u_scale`` are optional traced scalars multiplying the
        hopping/Coulomb couplings (``None`` = 1, the static Hamiltonian) —
        the hook :class:`ScheduledEvolution` threads per-step schedule
        values through.
        """
        hop_dt = dt if t_scale is None else dt * t_scale
        cou_dt = dt if u_scale is None else dt * u_scale
        seq = list(range(len(self._groups)))
        if not reverse:
            psi = diagonal_rotation(psi, self._coulomb_diag, cou_dt)
            for i in seq:
                psi = generator_rotation(psi, self.n_qubits, self._groups[i], -self._t * hop_dt)
        else:
            for i in reversed(seq):
                psi = generator_rotation(psi, self.n_qubits, self._groups[i], -self._t * hop_dt)
            psi = diagonal_rotation(psi, self._coulomb_diag, cou_dt)
        return psi

    def step(self, psi: jnp.ndarray, t_scale=None, u_scale=None) -> jnp.ndarray:
        """One Trotter step of ``dt`` (trace-time; jit via evolve())."""
        if self.order == 1:
            return self._half_sweep(psi, self.dt, False, t_scale, u_scale)
        psi = self._half_sweep(psi, self.dt / 2.0, False, t_scale, u_scale)
        return self._half_sweep(psi, self.dt / 2.0, True, t_scale, u_scale)

    # -- trajectory ---------------------------------------------------------------

    def evolve(
        self,
        psi0: jnp.ndarray,
        n_steps: int,
        observables: Optional[Dict[str, Observable]] = None,
        overlaps: Optional[Dict[str, np.ndarray]] = None,
    ):
        """Propagate ``n_steps`` and record observables after every step.

        ``observables`` record real expectation values; ``overlaps`` maps
        names to FIXED reference vectors and records the complex series
        ``<ref | psi(t)>`` (the object Green's functions are made of).
        Returns ``(psi_final, records)`` where each record is the
        length-``n_steps`` time series and ``psi_final`` is a host numpy
        complex vector.  One jitted ``lax.scan`` -- program size
        independent of n_steps.  The jit boundary is complex-free
        (stacked real ``(2, 2^n)`` planes in and out -- the axon TPU ABI,
        engine/state.py); ``psi0`` and the overlap references must
        therefore be host-fetchable (build them on the CPU device).
        """
        return self._evolve(psi0, n_steps, observables, overlaps, scales=None)

    def _evolve(self, psi0, n_steps, observables, overlaps, scales):
        obs = observables or {}
        clash = set(obs) & set(overlaps or {})
        if clash:
            raise ValueError(
                f"observable and overlap records share one namespace; "
                f"duplicate name(s): {sorted(clash)}"
            )
        ovl = {
            name: jnp.asarray(to_reim_host(np.asarray(v), self.dtype))
            for name, v in (overlaps or {}).items()
        }
        constrain = None
        if self.mesh is not None:
            from ..parallel.mesh import constrain_amp

            constrain = lambda psi: constrain_amp(psi, self.mesh)

        def body(psi, xs):
            psi = self.step(psi) if xs is None else self.step(psi, xs[0], xs[1])
            if constrain is not None:
                psi = constrain(psi)
            vals = tuple(o.expectation(psi) for o in obs.values())
            ovals = []
            for ref_r in ovl.values():
                amp = jnp.vdot(from_reim(ref_r, self.dtype), psi)
                ovals.append((jnp.real(amp), jnp.imag(amp)))
            return psi, (vals, tuple(ovals))

        @jax.jit
        def run(psi_r, xs):
            psi = from_reim(psi_r, self.dtype)
            psi_final, series = jax.lax.scan(body, psi, xs, length=n_steps)
            return to_reim(psi_final), series

        psi0_r = jnp.asarray(to_reim_host(np.asarray(psi0), self.dtype))
        psi_final_r, (series, oseries) = run(psi0_r, scales)
        arr = np.asarray(psi_final_r)
        psi_final = arr[0] + 1j * arr[1]
        records = {
            name: np.asarray(series[i]) for i, name in enumerate(obs.keys())
        }
        for i, name in enumerate(ovl.keys()):
            re, im = oseries[i]
            records[name] = np.asarray(re) + 1j * np.asarray(im)
        return psi_final, records


def _schedule_values(schedule, default, times):
    """Evaluate a coupling schedule: callable tau->value, per-step array,
    scalar, or None (= the problem's static coupling)."""
    if schedule is None:
        return np.full(len(times), float(default))
    if callable(schedule):
        return np.array([float(schedule(t)) for t in times])
    arr = np.asarray(schedule, dtype=np.float64)
    if arr.ndim == 0:
        return np.full(len(times), float(arr))
    if arr.shape != (len(times),):
        raise ValueError(f"schedule must have one value per step, got {arr.shape}")
    return arr


class ScheduledEvolution(TrotterEvolution):
    """Real-time evolution under time-dependent couplings t(tau), U(tau).

    Interaction quenches/ramps and Floquet driving: each Trotter step uses
    the couplings sampled at the step MIDPOINT ``tau_k = (k + 1/2) dt``
    (the midpoint product formula, second-order accurate for smooth
    schedules alongside the Strang splitting).  Schedules are callables
    ``tau -> coupling``, per-step arrays, or scalars, in the same units as
    the problem's static ``tunneling``/``coulomb``; ``None`` keeps the
    static value.  The schedule values ride the ``lax.scan`` as traced
    per-step inputs, so one compiled program serves every ramp shape of
    the same length — re-ramping costs no recompile (TPU-first: the
    program hash does not depend on the schedule contents).

    The dropped JW identity constant scales with U, so under a U-schedule
    the propagator differs from ``exp(-i int H)`` by the time-dependent
    global phase ``exp(+i shift0 int u_scale)``; ``records['shift_phase']``
    returns that accumulated integral so overlap records can be unfolded.
    Expectation-value records are phase-invariant and need nothing.
    """

    def evolve(
        self,
        psi0: jnp.ndarray,
        n_steps: int,
        observables: Optional[Dict[str, Observable]] = None,
        overlaps: Optional[Dict[str, np.ndarray]] = None,
        tunneling=None,
        coulomb=None,
    ):
        if "shift_phase" in (observables or {}) or "shift_phase" in (overlaps or {}):
            raise ValueError("'shift_phase' is a reserved record name")
        times = (np.arange(n_steps) + 0.5) * self.dt
        t_vals = _schedule_values(tunneling, self.problem.tunneling, times)
        u_vals = _schedule_values(coulomb, self.problem.coulomb, times)
        t0 = float(self.problem.tunneling)
        u0 = float(self.problem.coulomb)
        if t0 == 0.0 and np.any(t_vals != 0.0):
            raise ValueError(
                "tunneling schedule needs a problem with nonzero static t "
                "(the hopping layer is scaled relative to it)"
            )
        if u0 == 0.0 and np.any(u_vals != 0.0):
            raise ValueError(
                "coulomb schedule needs a problem with nonzero static U "
                "(the Coulomb diagonal is scaled relative to it)"
            )
        rdt = real_dtype(self.dtype)
        t_scales = np.where(t_vals == 0.0, 0.0, t_vals / (t0 if t0 else 1.0))
        u_scales = np.where(u_vals == 0.0, 0.0, u_vals / (u0 if u0 else 1.0))
        scales = (
            jnp.asarray(t_scales, dtype=rdt),
            jnp.asarray(u_scales, dtype=rdt),
        )
        psi_final, records = self._evolve(
            psi0, n_steps, observables, overlaps, scales
        )
        records["shift_phase"] = self.energy_shift * self.dt * np.cumsum(u_scales)
        return psi_final, records


def apply_on_host(obs: Observable, vec, dtype) -> np.ndarray:
    """One Observable application pinned to the host CPU backend.

    Building the excited vector ``|phi> = c^(dag)_m |gs>`` is one-time prep
    on a host-resident ground state; complex arrays must not cross the
    accelerator jit ABI (engine/state.py), so the application runs on the
    CPU device and the caller re-uploads via the reim boundary.  Same
    pattern as engine/circuits.slater_prep_reim.
    """
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None

    def _run():
        return np.asarray(obs.apply(jnp.asarray(np.asarray(vec), dtype=dtype)))

    if cpu is not None and jax.devices()[0].platform != "cpu":
        with jax.default_device(cpu):
            return _run()
    return _run()


def excitation_operator(mode, kind: str = "particle") -> FermionOperator:
    """The ladder operator whose action on |gs> seeds a Green's function.

    ``mode`` may be a JW mode index (``kind`` picks ``c^dag_m`` / ``c_m``)
    or an arbitrary :class:`FermionOperator` (e.g. a momentum-space ladder
    ``c^dag_k = N^{-1/2} sum_r e^{i k.r} c^dag_r`` for A(k, omega)).
    Shared by the real-time route below and the Lanczos resolvent route
    (linalg/spectral.py).
    """
    if isinstance(mode, FermionOperator):
        return mode
    if kind == "particle":
        return FermionOperator(((mode, 1),))
    if kind == "hole":
        return FermionOperator(((mode, 0),))
    raise ValueError("kind must be 'particle' or 'hole'")


def greens_function(
    problem,
    ground_state: np.ndarray,
    ground_energy: float,
    mode: int,
    dt: float,
    n_steps: int,
    kind: str = "particle",
    order: int = 2,
    dtype=None,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Retarded single-particle Green's function via real-time evolution.

    ``kind='particle'``: ``G^>(t) = <gs| c_m e^{-i(H - E0) t} c^dag_m |gs>``
    (photoemission-inverse / electron addition); ``kind='hole'`` swaps the
    ladder operators (electron removal).  The excited vector
    ``|phi> = c^(dag)_m |gs>`` is built with one ``Observable.apply``
    (JW of the ladder operator is two Pauli strings), evolved with the
    Trotter propagator, and overlapped against itself each step -- the
    ``e^{+i E0 t}`` rotating frame is folded in on the host.  Peaks of
    ``-Im FFT[G]`` sit at the (N+-1)-sector excitation energies
    ``E_n(N+-1) - E0(N)`` (tests/test_dynamics.py pins this against the
    dense propagator).  Returns ``(times, G)`` (complex, length n_steps).

    Capability context: the reference framework computes ground states
    only; spectral functions are the standard observable this unlocks.
    """
    dtype = dtype or default_dtype()
    op = Observable(jordan_wigner(excitation_operator(mode, kind)), problem.n_qubits)
    phi = apply_on_host(op, ground_state, dtype)
    ev = TrotterEvolution(problem, dt=dt, order=order, dtype=dtype, mesh=mesh)
    _, rec = ev.evolve(phi, n_steps, overlaps={"G": phi})
    times = (np.arange(n_steps) + 1) * dt
    # the propagator evolves under H - energy_shift (global phase); the
    # rotating frame therefore uses the same shifted ground energy
    return times, rec["G"] * np.exp(1j * (ground_energy - ev.energy_shift) * times)
