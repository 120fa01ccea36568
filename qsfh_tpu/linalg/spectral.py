"""Lanczos resolvent spectroscopy: spectral functions without time evolution.

The classic ED route to single-particle spectra: seed a Krylov space from
the excited vector ``|phi> = c^(dag)_m |gs>``, tridiagonalize H in it, and
read the resolvent

    R(omega) = <phi| [(omega + i eta) - (H - E0)]^{-1} |phi>

off the small tridiagonal — every pole/weight in one Lanczos run, no
Trotter error and no long trajectory.  Complements the real-time route
(``algos/dynamics.greens_function``): identical convention (peaks of
``-Im R / pi`` at the (N+-1)-sector excitation energies ``E_n - E0``),
so the two can cross-validate each other.

TPU shape: the Lanczos recursion is a fixed-length ``lax.scan`` holding
only THREE statevectors (no basis storage, unlike the ground-state
Lanczos in linalg/lanczos.py that reorthogonalizes) — memory stays O(2^n)
at any Krylov depth, so the sweep runs at every scale the engine holds.
Without reorthogonalization deep recursions can produce spurious
duplicate ("ghost") poles; they carry near-zero first-component weight
and broaden away, the standard trade accepted by ED spectroscopy codes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from ..engine.expectation import Observable
from ..engine.state import from_reim, real_dtype, to_reim_host
from ..ops.jw import jordan_wigner

__all__ = [
    "lanczos_tridiagonal",
    "resolvent_poles",
    "spectral_function_lanczos",
    "dynamical_structure_factor",
]


def lanczos_tridiagonal(
    matvec, phi, m: int, mesh=None
) -> Tuple[np.ndarray, np.ndarray, float]:
    """``m`` Lanczos steps from ``phi`` keeping three vectors.

    Returns host ``(alphas, betas, norm2)``: the tridiagonal coefficients
    (``betas[j] = ||w_j||`` produced at step j; the off-diagonals of T are
    ``betas[:-1]``) and ``norm2 = <phi|phi>``.  The recursion is one jitted
    ``lax.scan`` with a complex-free reim boundary (TPU ABI).

    ``mesh``: optional :class:`jax.sharding.Mesh` -- both recursion vectors
    are amplitude-sharded and re-pinned every step (the same contract as
    :class:`~qsfh_tpu.algos.ite.ImaginaryTimeEvolution`), so spectroscopy
    scales over the same mesh axis as the solvers.
    """
    phi = np.asarray(phi)
    norm2 = float(np.real(np.vdot(phi, phi)))
    if norm2 < 1e-28:
        return np.zeros(0), np.zeros(0), 0.0
    wide = phi.dtype in (np.dtype(np.complex128), np.dtype(np.float64))
    dtype = jnp.complex128 if wide else jnp.complex64
    rdt = real_dtype(dtype)
    constrain = lambda v: v
    if mesh is not None:
        from ..parallel.mesh import constrain_amp

        constrain = lambda v: constrain_amp(v, mesh)

    def body(carry, _):
        v, v_prev, beta_prev = carry
        w = matvec(v)
        alpha = jnp.real(jnp.vdot(v, w)).astype(rdt)
        w = w - alpha * v - beta_prev * v_prev
        beta = jnp.linalg.norm(w).astype(rdt)
        v_next = jnp.where(beta > 1e-14, w / jnp.maximum(beta, 1e-30), w * 0)
        return (constrain(v_next), v, beta), (alpha, beta)

    @jax.jit
    def run(phi_r):
        v0 = from_reim(phi_r, dtype)
        v0 = constrain(v0 / jnp.linalg.norm(v0))
        _, (alphas, betas) = jax.lax.scan(
            body, (v0, jnp.zeros_like(v0), jnp.zeros((), rdt)), None, length=m
        )
        return alphas, betas

    alphas, betas = run(jnp.asarray(to_reim_host(phi, dtype)))
    alphas, betas = np.asarray(alphas, np.float64), np.asarray(betas, np.float64)
    # truncate at Krylov breakdown (exhausted invariant subspace)
    dead = np.nonzero(betas < 1e-12)[0]
    if dead.size:
        keep = int(dead[0]) + 1
        alphas, betas = alphas[:keep], betas[:keep]
    return alphas, betas, norm2


def resolvent_poles(
    alphas: np.ndarray, betas: np.ndarray, norm2: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Poles (absolute H eigenvalues of T) and weights of
    ``norm2 * e1^T [z - T]^{-1} e1``: ``weights = norm2 * |evec[0, :]|^2``.
    Sum rule: ``weights.sum() == norm2`` exactly.
    """
    if alphas.size == 0:
        return np.zeros(0), np.zeros(0)
    theta, vecs = scipy.linalg.eigh_tridiagonal(alphas, betas[:-1])
    return theta, norm2 * np.abs(vecs[0, :]) ** 2


def spectral_function_lanczos(
    problem,
    ground_state: np.ndarray,
    ground_energy: float,
    mode,
    kind: str = "particle",
    m: int = 100,
    omegas: Optional[np.ndarray] = None,
    eta: float = 0.05,
    dtype=None,
    mesh=None,
):
    """Single-particle spectral function via the Lanczos resolvent.

    Same surface as :func:`~qsfh_tpu.algos.dynamics.greens_function` (mode
    index or arbitrary :class:`FermionOperator`; ``kind`` = 'particle' /
    'hole') but returns the spectrum directly: a dict with the discrete
    ``poles`` (excitation energies ``E_n - E0``), their ``weights``
    (``sum = <phi|phi>``), and — when ``omegas`` is given — the broadened
    ``A(omega) = sum_k w_k * eta/pi / ((omega - pole_k)^2 + eta^2)``.
    """
    from ..algos.base import default_dtype
    from ..algos.dynamics import apply_on_host, excitation_operator

    dtype = dtype or default_dtype()
    ladder = Observable(
        jordan_wigner(excitation_operator(mode, kind)), problem.n_qubits
    )
    phi = apply_on_host(ladder, ground_state, dtype)
    ham = Observable(problem.qubit_hamiltonian, problem.n_qubits)
    alphas, betas, norm2 = lanczos_tridiagonal(ham.apply_auto, phi, m, mesh=mesh)
    theta, weights = resolvent_poles(alphas, betas, norm2)
    poles = theta - float(ground_energy)
    out = {"poles": poles, "weights": weights, "norm2": norm2}
    if omegas is not None:
        omegas = np.asarray(omegas, dtype=np.float64)
        lor = (eta / np.pi) / ((omegas[:, None] - poles[None, :]) ** 2 + eta**2)
        out["omegas"] = omegas
        out["A"] = lor @ weights
    return out


def dynamical_structure_factor(
    problem,
    ground_state: np.ndarray,
    ground_energy: float,
    q: Tuple[int, int],
    kind: str = "spin",
    m: int = 100,
    omegas: Optional[np.ndarray] = None,
    eta: float = 0.05,
    dtype=None,
    mesh=None,
):
    """Dynamical spin/charge structure factor via the Lanczos resolvent.

    ``S^{zz}(q, omega)`` (``kind='spin'``) or ``N(q, omega)``
    (``kind='charge'``): the resolvent seeded from ``O_q|gs>`` with
    ``O_q = S^z_q`` / ``n_q`` (ops/correlations.py momentum-space
    fluctuation operators) -- two-particle spectroscopy within the SAME
    ``(N, Sz)`` sector, complementing the single-particle ``A(k, omega)``
    of :func:`spectral_function_lanczos`.  Capability context: the
    reference computes ground states only; inelastic-neutron-style
    observables are the standard diagnostic this unlocks.

    Sum rule: ``sum(weights) = <gs|O_q^dag O_q|gs>``, the static structure
    factor (for 'spin' in an SU(2)-singlet ground state it equals
    ``structure_factor(...)/3`` -- tested).  ``q`` indexes the discrete
    momentum grid (``q_phys = 2 pi (qx/nx, qy/ny)``); the charge operator
    is mean-subtracted at ``q = 0`` using the problem's filling.
    """
    from ..ops.correlations import charge_q_operator, spin_q_operator

    nx, ny = problem.x_dimension, problem.y_dimension
    if kind == "spin":
        op = spin_q_operator(nx, ny, q[0], q[1])
    elif kind == "charge":
        op = charge_q_operator(
            nx, ny, q[0], q[1], filling=problem.n_electrons / (nx * ny)
        )
    else:
        raise ValueError("kind must be 'spin' or 'charge'")
    return spectral_function_lanczos(
        problem,
        ground_state,
        ground_energy,
        op,
        m=m,
        omegas=omegas,
        eta=eta,
        dtype=dtype,
        mesh=mesh,
    )
