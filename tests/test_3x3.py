"""3x3 lattice (18 qubits) driver tests with the degenerate ground manifold.

Reference: /root/reference/models/hva_for_3x3.py and adapt_vqe_for_3x3.py --
ground truth is the 4-dimensional degenerate ground subspace at 9 electrons
(5 up / 4 down), fidelity is projection onto its span
(hva_for_3x3.py:305-312).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsfh_tpu.algos.base import HubbardProblem


@pytest.fixture(scope="module")
def problem_3x3(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("res3x3"))
    return HubbardProblem(3, 3, 1.0, 6.0, 9, 5, 4, results_root=root)


@pytest.mark.slow
class TestDegenerateGroundSpace:
    def test_four_orthonormal_states(self, problem_3x3):
        energy, states = problem_3x3.ground_state(degenerate=True, n_states=4)
        assert len(states) == 4
        # orthonormality
        G = np.array(
            [[complex(jnp.vdot(a, b)) for b in states] for a in states]
        )
        np.testing.assert_allclose(G, np.eye(4), atol=1e-8)
        # all four are eigenstates at the same energy
        H = problem_3x3.observables["H"]
        for s in states:
            hs = H.apply(jnp.asarray(s))
            e = float(jnp.real(jnp.vdot(s, hs)))
            np.testing.assert_allclose(e, energy, atol=1e-6)
            # residual ||H s - e s|| small -> genuine eigenvector
            res = float(jnp.linalg.norm(hs - e * jnp.asarray(s)))
            assert res < 1e-5

    def test_energy_value(self, problem_3x3):
        energy, _ = problem_3x3.ground_state(degenerate=True, n_states=4)
        # regression golden from the sector Lanczos (U=6, t=1, 5up/4down)
        np.testing.assert_allclose(energy, -5.562309, atol=1e-5)

    def test_cache_roundtrip(self, problem_3x3):
        e1, s1 = problem_3x3.ground_state(degenerate=True, n_states=4)
        e2, s2 = problem_3x3.ground_state(degenerate=True, n_states=4)  # cached
        assert e1 == e2
        np.testing.assert_allclose(np.asarray(s1[0]), np.asarray(s2[0]))


@pytest.mark.slow
class TestHVA3x3:
    def test_short_run_improves_and_tracks_subspace(self, problem_3x3, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from qsfh_tpu.algos.hva import HVA

        vqe = HVA(
            n_epoch=8,
            reps=2,
            lr=3e-2,
            x_dimension=3,
            y_dimension=3,
            n_electrons=9,
            n_spin_up=5,
            n_spin_down=4,
            tunneling=1.0,
            coulomb=6.0,
            degenerate_subspace=4,
            results_root=problem_3x3.results_root,  # reuse the ED cache
            plot=False,
            log_metrics=False,
        )
        results = vqe.run()
        assert len(results["loss"]) == 8
        # fidelity is a projection probability onto the 4-dim manifold
        assert all(0.0 <= f <= 1.0 + 1e-9 for f in results["fidelity"])
        # 5 up / 4 down: Sz must stay +1/2
        np.testing.assert_allclose(results["Sz"][-1], 0.5, atol=1e-6)
        # energy must be variational wrt the true ground energy
        assert min(results["loss"]) >= vqe.ground_state_energy - 1e-5
