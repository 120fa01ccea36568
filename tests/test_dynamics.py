"""Real-time Trotter dynamics (algos/dynamics.py) vs exact expm."""

import numpy as np
import pytest
import scipy.linalg

import jax.numpy as jnp

from qsfh_tpu.algos.base import HubbardProblem
from qsfh_tpu.algos.dynamics import TrotterEvolution
from qsfh_tpu.engine.expectation import Observable
from qsfh_tpu.engine.state import basis_state
from qsfh_tpu.ops.jw import jordan_wigner
from qsfh_tpu.utils.dense import paulisum_to_dense


@pytest.fixture(scope="module")
def quench():
    """2x2 t=1 U=4 quench from the Neel product state."""
    p = HubbardProblem(2, 2, 1.0, 4.0, 4, 2, 2, results_root="results")
    psi0 = np.asarray(basis_state(8, (0, 3, 5, 6), dtype=jnp.complex128))
    h = paulisum_to_dense(p.qubit_hamiltonian, 8)
    t_final = 2.0
    psi_exact = scipy.linalg.expm(-1j * h * t_final) @ psi0
    return p, psi0, h, t_final, psi_exact


def test_generator_coefficient_relations(quench):
    """The exact relations the propagator relies on: H_hop = -t * sum of
    color-class generators; the Coulomb diagonal differs from JW(U-term)
    only by a constant (global phase)."""
    p, *_ = quench
    h_rots, v_rots = p.hva_generators()
    total = sum(
        (paulisum_to_dense(g, 8) for g in h_rots + v_rots),
        np.zeros((256, 256), dtype=complex),
    )
    hop = paulisum_to_dense(jordan_wigner(p.quadratic_term), 8)
    np.testing.assert_allclose(hop, -p.tunneling * total, atol=1e-12)
    d = np.diag(paulisum_to_dense(jordan_wigner(p.interacting_term), 8)).real
    shift = d - np.asarray(p.coulomb_diagonal())
    np.testing.assert_allclose(shift, shift[0], atol=1e-12)


def test_strang_matches_exact_evolution(quench):
    p, psi0, h, t_final, psi_exact = quench
    ev = TrotterEvolution(p, dt=0.02, order=2, dtype=jnp.complex128)
    obs = {"H": p.observables["H"],
           "D": Observable(jordan_wigner(p.interacting_term), 8)}
    psi_f, rec = ev.evolve(psi0, 100, obs)
    psi_f = np.asarray(psi_f)
    # unitarity + fidelity against the dense propagator
    assert np.linalg.norm(psi_f) == pytest.approx(1.0, abs=1e-10)
    assert abs(np.vdot(psi_exact, psi_f)) ** 2 > 0.999_99
    # energy is conserved exactly at 0 for the Neel quench; the recorded
    # drift is pure Trotter error
    assert abs(rec["H"][-1]) < 5e-3
    d_exact = (psi_exact.conj() @ paulisum_to_dense(
        jordan_wigner(p.interacting_term), 8) @ psi_exact).real
    assert rec["D"][-1] == pytest.approx(d_exact, abs=2e-3)


def test_strang_is_second_order(quench):
    """Halving dt cuts the <H> drift by ~4 (it would be ~2 for order 1)."""
    p, psi0, *_ = quench
    obs = {"H": p.observables["H"]}
    drifts = []
    for dt, n in [(0.04, 50), (0.02, 100)]:
        ev = TrotterEvolution(p, dt=dt, order=2, dtype=jnp.complex128)
        _, rec = ev.evolve(psi0, n, obs)
        drifts.append(abs(rec["H"][-1]))
    ratio = drifts[0] / drifts[1]
    assert 3.0 < ratio < 5.0


def test_first_order_is_first_order_and_less_accurate(quench):
    p, psi0, h, t_final, psi_exact = quench
    ev1 = TrotterEvolution(p, dt=0.02, order=1, dtype=jnp.complex128)
    ev2 = TrotterEvolution(p, dt=0.02, order=2, dtype=jnp.complex128)
    f1 = abs(np.vdot(psi_exact, np.asarray(ev1.evolve(psi0, 100)[0]))) ** 2
    f2 = abs(np.vdot(psi_exact, np.asarray(ev2.evolve(psi0, 100)[0]))) ** 2
    assert f2 > f1
    assert f1 > 0.999  # still convergent


def test_order_validation():
    p = HubbardProblem(2, 2, 1.0, 4.0, 4, 2, 2, results_root="results")
    with pytest.raises(ValueError):
        TrotterEvolution(p, dt=0.1, order=3)


def test_sharded_trajectory_matches_single_device(quench):
    """mesh=... amplitude-shards the trajectory over the virtual 8-device
    mesh; the GSPMD lowering reproduces the single-device evolution."""
    from qsfh_tpu.parallel.mesh import amplitude_mesh

    p, psi0, h, t_final, psi_exact = quench
    obs = {"H": p.observables["H"]}
    single = TrotterEvolution(p, dt=0.05, order=2, dtype=jnp.complex128)
    psi_s, rec_s = single.evolve(psi0, 20, obs)
    sharded = TrotterEvolution(
        p, dt=0.05, order=2, dtype=jnp.complex128, mesh=amplitude_mesh(8)
    )
    psi_m, rec_m = sharded.evolve(psi0, 20, obs)
    np.testing.assert_allclose(np.asarray(psi_m), np.asarray(psi_s), atol=1e-12)
    np.testing.assert_allclose(rec_m["H"], rec_s["H"], atol=1e-12)


def test_greens_function_matches_dense(quench):
    """G^>(t) = <gs| c_0 e^{-i(H-E0)t} c0^dag |gs> from the Trotter
    propagator matches the dense eigendecomposition; its spectral content
    lives entirely in the (N+1)-sector excitation energies."""
    from qsfh_tpu.algos.dynamics import greens_function
    from qsfh_tpu.engine.expectation import Observable
    from qsfh_tpu.ops.fermion import FermionOperator
    from qsfh_tpu.ops.jw import jordan_wigner

    p, *_ = quench
    e0, gs = p.ground_state()
    gs = np.asarray(gs)
    times, g = greens_function(p, gs, e0, mode=0, dt=0.02, n_steps=50)

    h = paulisum_to_dense(p.qubit_hamiltonian, 8)
    cdag = paulisum_to_dense(jordan_wigner(FermionOperator(((0, 1),))), 8)
    phi = cdag @ gs
    evals, evecs = np.linalg.eigh(h)
    c = evecs.conj().T @ phi
    g_exact = np.array([
        np.vdot(phi, evecs @ (np.exp(-1j * evals * t) * c)) * np.exp(1j * e0 * t)
        for t in times
    ])
    np.testing.assert_allclose(g, g_exact, atol=2e-3)
    # G(0+) -> <gs| c c^dag |gs> = 1 - <n_0>, real and in (0, 1)
    assert 0.0 < g[0].real < 1.0 and abs(g[0].imag) < 0.05


def test_hole_greens_function_initial_value(quench):
    """kind='hole': G^<(0+) -> <gs| c^dag c |gs> = <n_0>."""
    from qsfh_tpu.algos.dynamics import greens_function
    from qsfh_tpu.ops.fermion import FermionOperator
    from qsfh_tpu.ops.jw import jordan_wigner

    p, *_ = quench
    e0, gs = p.ground_state()
    gs = np.asarray(gs)
    _, g = greens_function(p, gs, e0, mode=0, dt=0.01, n_steps=2, kind="hole")
    n0 = paulisum_to_dense(
        jordan_wigner(FermionOperator(((0, 1), (0, 0)))), 8)
    n0_val = np.vdot(gs, n0 @ gs).real
    assert g[0].real == pytest.approx(n0_val, abs=5e-3)


def test_greens_function_accepts_operator(quench):
    """A FermionOperator excitation (momentum-space ladder) is accepted
    directly; for k=(0,0) the t=0+ value is <c_k c_k^dag> computed dense."""
    from qsfh_tpu.algos.dynamics import greens_function
    from qsfh_tpu.ops.fermion import FermionOperator
    from qsfh_tpu.ops.jw import jordan_wigner

    p, *_ = quench
    e0, gs = p.ground_state()
    gs = np.asarray(gs)
    op = FermionOperator.zero()
    for s in range(4):
        op += FermionOperator(((2 * s, 1),), 0.5)
    _, g = greens_function(p, gs, e0, mode=op, dt=0.01, n_steps=2)
    od = paulisum_to_dense(jordan_wigner(op), 8)
    phi = od @ gs
    assert g[0].real == pytest.approx(np.vdot(phi, phi).real, abs=5e-3)


# ---- time-dependent schedules ---------------------------------------------------


def _dense_scheduled_reference(p, psi0, t_fn, u_fn, t_final, n_ref):
    """Midpoint expm product at fine dt: near-exact time-ordered evolution."""
    quad = paulisum_to_dense(jordan_wigner(p.quadratic_term), 8)
    inter = paulisum_to_dense(jordan_wigner(p.interacting_term), 8)
    dt = t_final / n_ref
    psi = psi0.copy()
    for k in range(n_ref):
        tau = (k + 0.5) * dt
        h = (t_fn(tau) / p.tunneling) * quad + (u_fn(tau) / p.coulomb) * inter
        psi = scipy.linalg.expm(-1j * h * dt) @ psi
    return psi


def test_scheduled_constant_matches_static(quench):
    from qsfh_tpu.algos.dynamics import ScheduledEvolution

    p, psi0, *_ = quench
    static = TrotterEvolution(p, dt=0.05, order=2, dtype=jnp.complex128)
    sched = ScheduledEvolution(p, dt=0.05, order=2, dtype=jnp.complex128)
    f1, _ = static.evolve(psi0, 20)
    f2, _ = sched.evolve(psi0, 20)  # None schedules = static couplings
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-12)


def test_interaction_ramp_matches_dense(quench):
    """Linear U ramp 4 -> 8 over t=1: Strang + midpoint sampling tracks the
    near-exact dense time-ordered propagator."""
    from qsfh_tpu.algos.dynamics import ScheduledEvolution

    p, psi0, *_ = quench
    t_fn = lambda tau: 1.0
    u_fn = lambda tau: 4.0 + 4.0 * tau
    n_steps, t_final = 50, 1.0
    ev = ScheduledEvolution(p, dt=t_final / n_steps, order=2, dtype=jnp.complex128)
    obs = {"D": Observable(jordan_wigner(p.interacting_term), 8)}
    psi_f, rec = ev.evolve(psi0, n_steps, obs, coulomb=u_fn)
    psi_ref = _dense_scheduled_reference(p, psi0, t_fn, u_fn, t_final, 250)
    psi_f = np.asarray(psi_f)
    assert np.linalg.norm(psi_f) == pytest.approx(1.0, abs=1e-10)
    assert abs(np.vdot(psi_ref, psi_f)) ** 2 > 0.9999
    d_ref = (psi_ref.conj() @ paulisum_to_dense(
        jordan_wigner(p.interacting_term), 8) @ psi_ref).real
    # the U0=4 normalization makes the recorded D the U=4 interaction term
    assert rec["D"][-1] == pytest.approx(d_ref, abs=5e-3)


def test_schedule_shift_phase_unfolds_overlaps(quench):
    """Overlap records times exp(-i shift_phase) equal the dense
    time-ordered overlap (the U-dependent identity constant is the only
    phase the propagator drops)."""
    from qsfh_tpu.algos.dynamics import ScheduledEvolution

    p, psi0, *_ = quench
    u_fn = lambda tau: 4.0 * (1.0 + tau)
    n_steps, t_final = 20, 0.5
    ev = ScheduledEvolution(p, dt=t_final / n_steps, order=2, dtype=jnp.complex128)
    _, rec = ev.evolve(psi0, n_steps, overlaps={"L": psi0}, coulomb=u_fn)
    unfolded = rec["L"] * np.exp(-1j * rec["shift_phase"])
    psi_ref = _dense_scheduled_reference(
        p, psi0, lambda tau: 1.0, u_fn, t_final, 400
    )
    ref_overlap = np.vdot(psi0, psi_ref)
    assert abs(unfolded[-1] - ref_overlap) < 2e-3


def test_schedule_array_matches_callable(quench):
    from qsfh_tpu.algos.dynamics import ScheduledEvolution

    p, psi0, *_ = quench
    n_steps, dt = 10, 0.05
    u_fn = lambda tau: 4.0 + np.sin(3.0 * tau)
    u_arr = np.array([u_fn((k + 0.5) * dt) for k in range(n_steps)])
    ev = ScheduledEvolution(p, dt=dt, order=2, dtype=jnp.complex128)
    f1, _ = ev.evolve(psi0, n_steps, coulomb=u_fn)
    f2, _ = ev.evolve(psi0, n_steps, coulomb=u_arr)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-12)


def test_schedule_validation(quench):
    from qsfh_tpu.algos.dynamics import ScheduledEvolution

    p, psi0, *_ = quench
    ev = ScheduledEvolution(p, dt=0.05, dtype=jnp.complex128)
    with pytest.raises(ValueError):
        ev.evolve(psi0, 10, coulomb=np.ones(7))  # wrong length
    p0 = HubbardProblem(2, 2, 1.0, 0.0, 4, 2, 2, results_root="results")
    ev0 = ScheduledEvolution(p0, dt=0.05, dtype=jnp.complex128)
    with pytest.raises(ValueError):
        ev0.evolve(psi0, 10, coulomb=lambda tau: 1.0)  # U0 = 0


def test_record_name_collision_raises(quench):
    """observables and overlaps share the records namespace; a duplicate
    name (or the reserved 'shift_phase') must fail loudly instead of
    silently overwriting a series."""
    from qsfh_tpu.algos.dynamics import ScheduledEvolution

    p, psi0, _, _, _ = quench
    ev = TrotterEvolution(p, dt=0.1, dtype=jnp.complex128)
    obs = Observable(p.qubit_hamiltonian, 8)
    with pytest.raises(ValueError, match="duplicate"):
        ev.evolve(psi0, 2, observables={"G": obs}, overlaps={"G": psi0})
    sev = ScheduledEvolution(p, dt=0.1, dtype=jnp.complex128)
    with pytest.raises(ValueError, match="reserved"):
        sev.evolve(psi0, 2, observables={"shift_phase": obs})
