"""Imaginary-time evolution solver (algos/ite.py) vs exact diagonalization."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qsfh_tpu.algos.base import HubbardProblem
from qsfh_tpu.algos.ite import ImaginaryTimeEvolution, suggest_dbeta
from qsfh_tpu.engine.state import basis_state
from qsfh_tpu.ops.jw import jordan_wigner


@pytest.fixture(scope="module")
def problem():
    return HubbardProblem(2, 2, 1.0, 6.0, 4, 2, 2, results_root="results")


def test_suggest_dbeta_bounds(problem):
    db = suggest_dbeta(problem.qubit_hamiltonian)
    c_abs = float(np.abs(problem.qubit_hamiltonian.c).sum())
    assert db == pytest.approx(0.5 / (2 * c_abs))
    assert 0 < db < 1


def test_converges_to_sector_ground_state(problem):
    e0, gs = problem.ground_state()
    psi0 = basis_state(8, (0, 3, 5, 6), dtype=jnp.complex128)  # Neel, N=4 Sz=0
    ite = ImaginaryTimeEvolution(problem, dbeta=0.05, order=6, dtype=jnp.complex128)
    psi, rec = ite.run(psi0, n_steps=700, block=50, variance_tol=1e-10)
    assert rec["energies"][-1] == pytest.approx(e0, abs=1e-6)
    assert rec["variances"][-1] < 1e-10
    assert abs(np.vdot(np.asarray(gs), psi)) ** 2 > 1.0 - 1e-8
    # monotone-ish flow: big early drop, tiny tail
    assert rec["energies"][0] > rec["energies"][-1] + 1.0


def test_variance_certificate_on_eigenstate(problem):
    _, gs = problem.ground_state()
    ite = ImaginaryTimeEvolution(problem, dbeta=0.02, dtype=jnp.complex128)
    _, rec = ite.run(np.asarray(gs), n_steps=10, block=10)
    assert rec["variances"][-1] == pytest.approx(0.0, abs=1e-8)


def test_early_stop(problem):
    _, gs = problem.ground_state()
    ite = ImaginaryTimeEvolution(problem, dbeta=0.02, dtype=jnp.complex128)
    _, rec = ite.run(np.asarray(gs), n_steps=1000, block=25, variance_tol=1e-8)
    assert len(rec["energies"]) == 25  # stopped after the first block


def test_sector_is_preserved(problem):
    """N and Sz are conserved (the Neel start is an eigenstate of both);
    S^2 is NOT tested -- the product state mixes S^2 sectors and ITE
    correctly relaxes the mixture toward the ground state's."""
    from qsfh_tpu.engine.expectation import Observable

    psi0 = basis_state(8, (0, 3, 5, 6), dtype=jnp.complex128)
    ite = ImaginaryTimeEvolution(problem, dbeta=0.05, dtype=jnp.complex128)
    psi, _ = ite.run(psi0, n_steps=100, block=50)
    number = Observable(
        jordan_wigner(problem.fermion_operators["particle number"]), 8
    )
    checks = [(problem.observables["Sz"], 0.0), (number, 4.0)]
    for obs, expected in checks:
        after = float(np.real(obs.expectation(jnp.asarray(psi))))
        assert after == pytest.approx(expected, abs=1e-8)


@pytest.mark.slow  # ~16 s; sharded parity is covered fast by test_dynamics
def test_sharded_matches_single_device():
    from qsfh_tpu.parallel.mesh import amplitude_mesh

    p = HubbardProblem(2, 3, 1.0, 4.0, 6, 3, 3, results_root="results")
    psi0 = basis_state(12, (0, 3, 4, 7, 8, 11), dtype=jnp.complex128)
    single = ImaginaryTimeEvolution(p, dbeta=0.03, dtype=jnp.complex128)
    psi_a, rec_a = single.run(psi0, n_steps=20, block=10)
    mesh = amplitude_mesh(8)
    sharded = ImaginaryTimeEvolution(p, dbeta=0.03, dtype=jnp.complex128, mesh=mesh)
    psi_b, rec_b = sharded.run(psi0, n_steps=20, block=10)
    np.testing.assert_allclose(rec_a["energies"], rec_b["energies"], atol=1e-10)
    np.testing.assert_allclose(psi_a, psi_b, atol=1e-10)


# ---- finite temperature (typicality) ---------------------------------------------


def _dense_sector_thermal(problem, beta, ops_dense, idx):
    import scipy.linalg

    from qsfh_tpu.utils.dense import paulisum_to_dense

    h = paulisum_to_dense(problem.qubit_hamiltonian, 8)[np.ix_(idx, idx)]
    evals, evecs = np.linalg.eigh(h)
    w = np.exp(-beta * (evals - evals.min()))
    out = []
    for od in ops_dense:
        os_ = evecs.conj().T @ od[np.ix_(idx, idx)] @ evecs
        out.append(float((w * np.diag(os_).real).sum() / w.sum()))
    return out


@pytest.mark.parametrize("beta", [1.0, 4.0])
def test_thermal_expectation_matches_dense(problem, beta):
    from qsfh_tpu.engine.expectation import Observable
    from qsfh_tpu.linalg.sectors import jw_number_spin_indices
    from qsfh_tpu.utils.dense import paulisum_to_dense

    d_op = jordan_wigner(problem.interacting_term)
    obs = {"H": problem.observables["H"], "D": Observable(d_op, 8)}
    ite = ImaginaryTimeEvolution(problem, dbeta=0.02, order=4, dtype=jnp.complex128)
    est, diag = ite.thermal_expectation(
        beta, obs, n_samples=48, key=jax.random.PRNGKey(5)
    )
    idx = jw_number_spin_indices(4, 2, 2, 8)
    h_dense = paulisum_to_dense(problem.qubit_hamiltonian, 8)
    exact_h, exact_d = _dense_sector_thermal(
        problem, diag["beta_effective"], [h_dense, paulisum_to_dense(d_op, 8)], idx
    )
    for name, exact in (("H", exact_h), ("D", exact_d)):
        err = abs(est[name] - exact)
        assert err < max(5 * diag["stderrs"][name], 0.02), (name, est[name], exact)
    assert diag["effective_samples"] > 5


def test_thermal_large_beta_is_ground_state(problem):
    """The in-sector gap is ~0.31, so beta/2 = 20 suppresses the residual
    excited weight to ~4e-6 and the canonical average collapses onto E0."""
    e0, _ = problem.ground_state()
    ite = ImaginaryTimeEvolution(problem, dbeta=0.05, order=6, dtype=jnp.complex128)
    est, diag = ite.thermal_expectation(
        40.0, {"H": problem.observables["H"]}, n_samples=4,
        key=jax.random.PRNGKey(6),
    )
    assert est["H"] == pytest.approx(e0, abs=1e-3)


def test_exact_step_count_with_remainder(problem):
    """n_steps not a multiple of block: the remainder runs as one shorter
    block, so exactly n_steps entries are recorded (no overshoot)."""
    _, gs = problem.ground_state()
    ite = ImaginaryTimeEvolution(problem, dbeta=0.02, dtype=jnp.complex128)
    _, rec = ite.run(np.asarray(gs), n_steps=7, block=5)
    assert len(rec["energies"]) == 7
    assert len(rec["variances"]) == 7
