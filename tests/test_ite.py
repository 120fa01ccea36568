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
