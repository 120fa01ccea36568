"""ADAPT-VQE driver tests (reference: /root/reference/models/adapt_vqe.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsfh_tpu.algos.adapt import ADAPT
from qsfh_tpu.engine.gates import generator_rotation


@pytest.fixture(scope="module")
def adapt_2x2(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("adapt_results"))
    return ADAPT(
        n_epoch=2,
        threshold1=1e-2,
        threshold2=5e-2,
        x_dimension=2,
        y_dimension=2,
        n_electrons=4,
        n_spin_up=2,
        n_spin_down=2,
        tunneling=1.0,
        coulomb=6.0,
        results_root=root,
        plot=False,
        log_metrics=False,
    )


class TestScreening:
    @pytest.mark.slow
    def test_matches_eval_circuit_autodiff(self, adapt_2x2):
        """The commutator screening must equal the reference's eval-circuit
        gradient: d<H>/de_k at e=0 with the whole pool appended after the
        ansatz (adapt_vqe.py:336-341).  Full-pool autodiff builds a
        ~90-generator unrolled jaxpr (~35 s compile); the fast profile
        carries the same contract on a 12-generator slice below."""
        vqe = adapt_2x2
        n = vqe.n_qubits
        key = jax.random.PRNGKey(0)
        # random current ansatz of 3 pool ops
        idx = [0, 5, 11]
        thetas = jax.random.uniform(key, (3,), minval=-0.3, maxval=0.3)
        thetas = thetas.astype(vqe._rdt)

        psi_k = vqe._ansatz_k(thetas, idx)
        screened = np.asarray(vqe._screen_fn(psi_k))

        def eval_energy(e):
            psi = psi_k
            for k, rot in enumerate(vqe.pool_rot):
                psi = generator_rotation(psi, n, rot, e[k])
            psi = vqe._to_real(psi)
            return vqe.problem.observables["H"].expectation(psi)

        autodiff = np.asarray(
            jax.grad(eval_energy)(jnp.zeros(len(vqe.pool_rot), dtype=thetas.dtype))
        )
        np.testing.assert_allclose(screened, autodiff, atol=1e-8)

    def test_matches_eval_circuit_autodiff_sliced(self, adapt_2x2, tmp_path):
        """Fast-profile form of the contract above: the same screening-vs-
        eval-circuit identity on an ADAPT instance whose pool is a
        12-generator slice (same physics, ~8x smaller autodiff jaxpr)."""
        vqe = ADAPT(
            n_epoch=2, threshold1=1e-2, threshold2=5e-2,
            x_dimension=2, y_dimension=2, n_electrons=4,
            n_spin_up=2, n_spin_down=2, tunneling=1, coulomb=6.0,
            pool=adapt_2x2.fermion_pool[:12],
            results_root=str(tmp_path), plot=False, log_metrics=False,
        )
        n = vqe.n_qubits
        thetas = jnp.asarray([0.21, -0.17, 0.09], dtype=vqe._rdt)
        psi_k = vqe._ansatz_k(thetas, [0, 5, 11])
        screened = np.asarray(vqe._screen_fn(psi_k))

        def eval_energy(e):
            psi = psi_k
            for k, rot in enumerate(vqe.pool_rot):
                psi = generator_rotation(psi, n, rot, e[k])
            psi = vqe._to_real(psi)
            return vqe.problem.observables["H"].expectation(psi)

        autodiff = np.asarray(
            jax.grad(eval_energy)(jnp.zeros(len(vqe.pool_rot), dtype=thetas.dtype))
        )
        np.testing.assert_allclose(screened, autodiff, atol=1e-8)

    def test_selection_rule(self, adapt_2x2):
        idx, grads = adapt_2x2.select_operator()
        assert len(idx) > 0
        # sorted descending up to the deterministic tie-break: exactly
        # degenerate pool gradients order by pool index, so raw values may
        # invert by float noise within a tie
        assert all(a >= b - 1e-9 for a, b in zip(grads, grads[1:]))
        # ties ordered by ascending pool index
        for (i1, g1), (i2, g2) in zip(zip(idx, grads), zip(idx[1:], grads[1:])):
            if abs(g1 - g2) < 1e-10:
                assert i1 < i2
        gmax = grads[0]
        for g in grads:
            assert g >= gmax * adapt_2x2.ratio
            assert g >= adapt_2x2.threshold1


class TestTraining:
    def test_two_epochs_improve_energy(self, adapt_2x2):
        results = adapt_2x2.run()
        assert len(results["epoch loss"]) >= 1
        e0_exact = adapt_2x2.ground_state_energy
        # initial state is the non-interacting Slater determinant; after two
        # growth epochs energy must be well below the starting energy and
        # moving toward ED
        assert results["iteration loss"][-1] < results["iteration loss"][0] - 0.1
        assert results["iteration loss"][-1] >= e0_exact - 1e-6
        # symmetry preserved
        assert abs(results["Sz"][-1]) < 1e-6
        assert all(0.0 <= f <= 1.0 + 1e-9 for f in results["fidelity"])

    def test_resume_roundtrip(self, adapt_2x2):
        vqe = adapt_2x2
        vqe.save_model()
        reloaded = ADAPT(
            n_epoch=2,
            threshold1=1e-2,
            threshold2=5e-2,
            x_dimension=2,
            y_dimension=2,
            n_electrons=4,
            n_spin_up=2,
            n_spin_down=2,
            tunneling=1.0,
            coulomb=6.0,
            results_root=vqe.problem.results_root,
            plot=False,
            log_metrics=False,
            load_model=True,
        )
        assert reloaded.selected_indices == vqe.selected_indices
        np.testing.assert_allclose(
            np.asarray(reloaded.params_t), np.asarray(vqe.params_t)
        )
        assert reloaded.results["epoch loss"] == vqe.results["epoch loss"]

    def test_resume_under_extended_pool(self, adapt_2x2):
        """A simplified-pool checkpoint resumes under the EXTENDED pool
        (prefix contract, ops/pool.py hubbard_interaction_pool_extended);
        resuming an extended-pool checkpoint with a smaller pool refuses."""
        from qsfh_tpu.ops.pool import hubbard_interaction_pool_extended

        vqe = adapt_2x2
        vqe.save_model()
        kwargs = dict(
            n_epoch=2, threshold1=1e-2, threshold2=5e-2,
            x_dimension=2, y_dimension=2, n_electrons=4, n_spin_up=2,
            n_spin_down=2, tunneling=1.0, coulomb=6.0,
            results_root=vqe.problem.results_root, plot=False,
            log_metrics=False, load_model=True,
        )
        ext = ADAPT(pool=hubbard_interaction_pool_extended(2, 2), **kwargs)
        assert ext.selected_indices == vqe.selected_indices
        np.testing.assert_allclose(
            np.asarray(ext.params_t), np.asarray(vqe.params_t)
        )
        # same ansatz ops under either pool -> identical screening state
        ext.save_model()
        try:
            with pytest.raises(ValueError, match="larger pool"):
                ADAPT(**kwargs)
        finally:
            vqe.save_model()  # restore for later tests in this module


class TestLoweringDefaults:
    def test_auto_resolves_to_split_and_platform_adjoint(self):
        import jax as _jax

        from qsfh_tpu.algos.adapt import ADAPT as _ADAPT

        vqe = _ADAPT(
            n_epoch=0, threshold1=1e-2, threshold2=1e-2,
            x_dimension=2, y_dimension=2, n_electrons=4, n_spin_up=2,
            n_spin_down=2, tunneling=1.0, coulomb=6.0,
            ground_truth=False, plot=False, log_metrics=False,
        )
        assert vqe.circuit_mode == "split"
        platform = _jax.devices()[0].platform
        assert vqe.adjoint_threshold == (0 if platform == "cpu" else 20)
        # explicit overrides still win
        vqe2 = _ADAPT(
            n_epoch=0, threshold1=1e-2, threshold2=1e-2,
            x_dimension=2, y_dimension=2, n_electrons=4, n_spin_up=2,
            n_spin_down=2, tunneling=1.0, coulomb=6.0,
            ground_truth=False, plot=False, log_metrics=False,
            circuit_mode="unrolled", adjoint_threshold=20,
        )
        assert vqe2.circuit_mode == "unrolled"
        assert vqe2.adjoint_threshold == 20
