"""Lanczos resolvent spectroscopy (linalg/spectral.py) vs dense spectra."""

import numpy as np
import pytest

import jax.numpy as jnp

from qsfh_tpu.algos.base import HubbardProblem
from qsfh_tpu.linalg.spectral import (
    lanczos_tridiagonal,
    resolvent_poles,
    spectral_function_lanczos,
)
from qsfh_tpu.ops.fermion import FermionOperator
from qsfh_tpu.ops.jw import jordan_wigner
from qsfh_tpu.utils.dense import paulisum_to_dense


@pytest.fixture(scope="module")
def setup():
    p = HubbardProblem(2, 2, 1.0, 4.0, 4, 2, 2, results_root="results")
    e0, gs = p.ground_state()
    h = paulisum_to_dense(p.qubit_hamiltonian, 8)
    evals, evecs = np.linalg.eigh(h)
    return p, float(e0), np.asarray(gs), evals, evecs


def _dense_spectrum(ladder_dense, gs, e0, evals, evecs, omegas, eta):
    phi = ladder_dense @ gs
    w = np.abs(evecs.conj().T @ phi) ** 2
    poles = evals - e0
    lor = (eta / np.pi) / ((omegas[:, None] - poles[None, :]) ** 2 + eta**2)
    return lor @ w, float(np.vdot(phi, phi).real)


@pytest.mark.parametrize("kind,mode", [("particle", 0), ("hole", 1)])
def test_matches_dense_spectrum(setup, kind, mode):
    p, e0, gs, evals, evecs = setup
    omegas = np.linspace(-8, 12, 161)
    eta = 0.1
    res = spectral_function_lanczos(
        p, gs, e0, mode, kind=kind, m=120, omegas=omegas, eta=eta,
        dtype=jnp.complex128,
    )
    ladder = FermionOperator(((mode, 1),)) if kind == "particle" else FermionOperator(((mode, 0),))
    dense = paulisum_to_dense(jordan_wigner(ladder), 8)
    a_ref, norm2 = _dense_spectrum(dense, gs, e0, evals, evecs, omegas, eta)
    np.testing.assert_allclose(res["A"], a_ref, atol=1e-6)
    assert res["weights"].sum() == pytest.approx(norm2, abs=1e-9)
    assert res["norm2"] == pytest.approx(norm2, abs=1e-9)


def test_momentum_ladder_operator(setup):
    """A k=(0,0) momentum ladder: poles still bracket the dense spectrum."""
    p, e0, gs, evals, evecs = setup
    ladder = FermionOperator.zero()
    for site in range(4):
        ladder += 0.5 * FermionOperator(((2 * site, 1),))
    res = spectral_function_lanczos(p, gs, e0, ladder, m=100, dtype=jnp.complex128)
    dense = paulisum_to_dense(jordan_wigner(ladder), 8)
    phi = dense @ gs
    w_ref = np.abs(evecs.conj().T @ phi) ** 2
    # every Lanczos pole with real weight must sit on a dense eigenvalue
    live = res["weights"] > 1e-8
    for pole in res["poles"][live]:
        assert np.min(np.abs((evals - e0) - pole)) < 1e-7
    assert res["weights"].sum() == pytest.approx(w_ref.sum(), abs=1e-9)


def test_tridiagonal_breakdown_truncates():
    """A rank-2 invariant subspace breaks down after 2 steps."""
    h = np.diag([1.0, 3.0, 100.0])

    def matvec(v):
        return jnp.asarray(h) @ v

    phi = np.array([1.0, 1.0, 0.0], dtype=complex) / np.sqrt(2)
    alphas, betas, norm2 = lanczos_tridiagonal(matvec, phi, m=3)
    assert len(alphas) == 2
    theta, w = resolvent_poles(alphas, betas, norm2)
    np.testing.assert_allclose(theta, [1.0, 3.0], atol=1e-12)
    np.testing.assert_allclose(w, [0.5, 0.5], atol=1e-12)


def test_dynamical_spin_structure_factor(setup):
    """S^zz(q, omega) at the AFM point q=(1,1)=(pi,pi): pole positions and
    weights match the dense same-sector spectrum, and the integrated
    weight reproduces the static structure factor (S(q)/3 for the SU(2)-
    singlet ground state)."""
    from qsfh_tpu.linalg.spectral import dynamical_structure_factor
    from qsfh_tpu.ops.correlations import (
        correlation_matrix,
        spin_q_operator,
        structure_factor,
    )

    p, e0, gs, evals, evecs = setup
    omegas = np.linspace(-1, 12, 131)
    eta = 0.1
    res = dynamical_structure_factor(
        p, gs, e0, q=(1, 1), kind="spin", m=120, omegas=omegas, eta=eta,
        dtype=jnp.complex128,
    )
    dense = paulisum_to_dense(jordan_wigner(spin_q_operator(2, 2, 1, 1)), 8)
    a_ref, norm2 = _dense_spectrum(dense, gs, e0, evals, evecs, omegas, eta)
    np.testing.assert_allclose(res["A"], a_ref, atol=1e-6)
    assert res["weights"].sum() == pytest.approx(norm2, abs=1e-9)
    # sum rule vs the static (vector) structure factor: S(q) = 3 S_zz(q)
    corr = correlation_matrix(jnp.asarray(gs), 4, kind="spin")
    s_q = structure_factor(corr, 2, 2)[(1, 1)]
    assert 3.0 * res["weights"].sum() == pytest.approx(s_q, abs=1e-8)


def test_dynamical_charge_structure_factor(setup):
    """N(q, omega) at q=(1,0); the q=0 mean-subtracted operator
    annihilates the number eigenstate (zero seed, empty spectrum)."""
    from qsfh_tpu.linalg.spectral import dynamical_structure_factor
    from qsfh_tpu.ops.correlations import charge_q_operator

    p, e0, gs, evals, evecs = setup
    omegas = np.linspace(-1, 14, 151)
    eta = 0.1
    res = dynamical_structure_factor(
        p, gs, e0, q=(1, 0), kind="charge", m=120, omegas=omegas, eta=eta,
        dtype=jnp.complex128,
    )
    dense = paulisum_to_dense(jordan_wigner(charge_q_operator(2, 2, 1, 0)), 8)
    a_ref, norm2 = _dense_spectrum(dense, gs, e0, evals, evecs, omegas, eta)
    np.testing.assert_allclose(res["A"], a_ref, atol=1e-6)
    assert res["weights"].sum() == pytest.approx(norm2, abs=1e-9)
    res0 = dynamical_structure_factor(
        p, gs, e0, q=(0, 0), kind="charge", m=20, dtype=jnp.complex128
    )
    assert res0["norm2"] == pytest.approx(0.0, abs=1e-12)
    assert res0["poles"].size == 0


def test_lanczos_mesh_matches_single_device(setup):
    """The mesh-sharded recursion reproduces the unsharded tridiagonal."""
    from qsfh_tpu.engine.expectation import Observable
    from qsfh_tpu.parallel import amplitude_mesh

    p, e0, gs, evals, evecs = setup
    ham = Observable(p.qubit_hamiltonian, 8)
    rng = np.random.default_rng(5)
    phi = rng.standard_normal(256) + 1j * rng.standard_normal(256)
    a_ref, b_ref, n_ref = lanczos_tridiagonal(ham.apply_auto, phi, m=12)
    mesh = amplitude_mesh(8)
    with mesh:
        a_m, b_m, n_m = lanczos_tridiagonal(ham.apply_auto, phi, m=12, mesh=mesh)
    assert n_m == pytest.approx(n_ref)
    np.testing.assert_allclose(a_m, a_ref, atol=1e-9)
    np.testing.assert_allclose(b_m, b_ref, atol=1e-9)
