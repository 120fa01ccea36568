"""iQCC driver + dressing tests (reference: /root/reference/models/iqcc*.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsfh_tpu.algos.iqcc import IQCC, product_state
from qsfh_tpu.engine import gates
from qsfh_tpu.engine.state import zero_state
from qsfh_tpu.ops.dressing import dis_generators, dress_hamiltonian, dress_once
from qsfh_tpu.ops.lattice import fermi_hubbard
from qsfh_tpu.ops.jw import jordan_wigner
from qsfh_tpu.ops.pauli import PauliSum, qubit_operator
from qsfh_tpu.utils.dense import paulisum_to_dense


class TestProductState:
    def test_matches_gate_construction(self):
        n = 4
        key = jax.random.PRNGKey(3)
        thetas = jax.random.uniform(key, (n,), minval=-2.0, maxval=2.0, dtype=jnp.float64)
        phis = jax.random.uniform(
            jax.random.PRNGKey(4), (n,), minval=-2.0, maxval=2.0, dtype=jnp.float64
        )
        fast = product_state(thetas, phis, n, jnp.complex128)
        psi = zero_state(n, dtype=jnp.complex128)
        for i in range(n):
            psi = gates.ry(psi, n, thetas[i], i)
            psi = gates.rz(psi, n, phis[i], i)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(psi), atol=1e-12)


class TestDISGenerators:
    def test_partition_and_labels(self):
        H = (
            qubit_operator("Z0 Z1", 0.5)
            + qubit_operator("X0 X1", 0.25)
            + qubit_operator("Y0 Y1", 0.1)  # same flip set as X0 X1
            + qubit_operator("X2", 0.3)
            + qubit_operator("", 1.0)
        )
        dis = dis_generators(H)
        flipsets = [f for f, _ in dis]
        assert (0, 1) in flipsets
        assert (2,) in flipsets
        assert () not in flipsets  # identity and Z-only terms contribute nothing
        assert len(dis) == 2
        for flips, P in dis:
            term, coeff = P.to_terms()[0]
            assert term.startswith("Y")  # Y on the smallest flip index
            assert coeff == 1.0


class TestDressing:
    def _random_h(self, n=3, seed=0):
        rng = np.random.default_rng(seed)
        terms = [
            ("Z0 Z1", 0.7),
            ("X0 X1", 0.33),
            ("Y1 Z2", -0.21),
            ("X2", 0.11),
            ("Z0", -0.4),
        ]
        return PauliSum.from_terms(terms)

    def test_tau_zero_identity(self):
        H = self._random_h()
        P = qubit_operator("Y0 X1")
        dressed = dress_once(H, P, 0.0)
        np.testing.assert_allclose(
            paulisum_to_dense(dressed, 3), paulisum_to_dense(H, 3), atol=1e-12
        )

    def test_spectrum_invariance(self):
        """Dressing is a unitary similarity transform: spectrum preserved."""
        H = self._random_h()
        gens = [qubit_operator("Y0 X1"), qubit_operator("Y2")]
        taus = [0.37, -0.81]
        dressed, dropped, dweight = dress_hamiltonian(H, gens, taus)
        assert dropped == 0 and dweight == 0.0
        e0 = np.linalg.eigvalsh(paulisum_to_dense(H, 3))
        e1 = np.linalg.eigvalsh(paulisum_to_dense(dressed, 3))
        np.testing.assert_allclose(e0, e1, atol=1e-10)

    def test_energy_folding(self):
        """<psi| e^{+i tau P/2} H e^{-i tau P/2} |psi> equals the energy of
        the gated state under the original H (the iQCC circuit identity)."""
        n = 3
        H = self._random_h()
        P = qubit_operator("Y0 X1 X2")
        tau = 0.53
        dressed = dress_once(H, P, tau)
        psi = product_state(
            jnp.asarray([0.3, 1.1, -0.7]), jnp.asarray([0.2, -0.4, 0.9]), n, jnp.complex128
        )
        x, z = int(P.x[0]), int(P.z[0])
        psi_gated = gates.pauli_rotation(psi, n, x, z, tau / 2)
        Hd = paulisum_to_dense(H, n)
        Dd = paulisum_to_dense(dressed, n)
        e_gate = np.real(np.conj(np.asarray(psi_gated)) @ Hd @ np.asarray(psi_gated))
        e_dress = np.real(np.conj(np.asarray(psi)) @ Dd @ np.asarray(psi))
        np.testing.assert_allclose(e_gate, e_dress, atol=1e-10)

    def test_term_cap(self):
        H = self._random_h()
        full, _, _ = dress_hamiltonian(H, [qubit_operator("Y0 X1")], [0.4])
        dressed, dropped, dweight = dress_hamiltonian(
            H, [qubit_operator("Y0 X1")], [0.4], max_terms=4
        )
        assert len(dressed) == 4
        assert dropped > 0
        # the reported weight is exactly the summed |c| of what was cut
        expected = np.sort(np.abs(full.c))[: len(full) - 4].sum()
        np.testing.assert_allclose(dweight, expected, rtol=1e-12)

    def test_compaction_budget_bounds_spectrum_shift(self):
        """compact's dropped_weight rigorously bounds every eigenvalue
        shift (Weyl): |eig_k(H) - eig_k(H')| <= sum |c_dropped|."""
        from qsfh_tpu.ops.dressing import compact

        H = self._random_h()
        dressed, _, _ = dress_hamiltonian(
            H, [qubit_operator("Y0 X1"), qubit_operator("Y2")], [0.4, -0.9]
        )
        mags = np.sort(np.abs(dressed.c))
        eps = float(mags[:3].sum()) * 1.001  # guarantees >=3 drops
        compacted, k, weight = compact(dressed, eps)
        assert 0 < weight <= eps
        assert len(compacted) == len(dressed) - k
        e0 = np.linalg.eigvalsh(paulisum_to_dense(dressed, 3))
        e1 = np.linalg.eigvalsh(paulisum_to_dense(compacted, 3))
        assert np.max(np.abs(e0 - e1)) <= weight + 1e-12

        # budget 0 is the identity
        same, k0, w0 = compact(dressed, 0.0)
        assert k0 == 0 and w0 == 0.0 and len(same) == len(dressed)

    def test_compaction_eps_in_dress(self):
        H = self._random_h()
        dressed, dropped, weight = dress_hamiltonian(
            H, [qubit_operator("Y0 X1")], [0.4], compaction_eps=0.02
        )
        assert dropped >= 0
        assert weight <= 0.02


class TestIQCCDriver:
    def test_2x2_hubbard_improves(self, tmp_path):
        H = fermi_hubbard(2, 2, 1.0, 4.0, periodic=True, spinless=False)
        vqe = IQCC(
            H,
            n_epoch=2,
            lr=5e-2,
            threshold=5e-3,
            max_inner_iterations=80,
            results_root=str(tmp_path),
            plot=False,
            log_metrics=False,
        )
        hist = vqe.run()
        assert len(hist["epoch"]) >= 1
        # energy decreases and never dips below the exact ground energy
        assert hist["epoch"][-1] < hist["iteration"][0]
        assert hist["epoch"][-1] >= vqe.ground_state_energy - 1e-6
        # dressing grew the Hamiltonian (complexity moved into H)
        assert len(vqe.current_hamiltonian) >= len(vqe.initial_hamiltonian)

    def test_resume_roundtrip(self, tmp_path):
        H = fermi_hubbard(2, 2, 1.0, 4.0, periodic=True, spinless=False)
        kwargs = dict(
            n_epoch=1,
            lr=5e-2,
            threshold=5e-3,
            max_inner_iterations=30,
            results_root=str(tmp_path),
            plot=False,
            log_metrics=False,
        )
        vqe = IQCC(H, **kwargs)
        vqe.run()
        reloaded = IQCC(H, **kwargs, load_model=True)
        np.testing.assert_allclose(
            np.asarray(reloaded.params["theta"]), np.asarray(vqe.params["theta"])
        )
        assert len(reloaded.current_hamiltonian) == len(vqe.current_hamiltonian)
        assert reloaded.loss_history["epoch"] == vqe.loss_history["epoch"]


    def test_dense_resume_refuses_missing_sidecar(self, tmp_path):
        """A dense-dressing checkpoint whose .dense.npy sidecar is lost must
        refuse to resume: the npz's symbolic H is the UNDRESSED initial
        Hamiltonian, so a silent rebuild would continue from wrong energies
        (ADVICE r4, iqcc.py:533)."""
        import glob
        import os

        H = fermi_hubbard(2, 2, 1.0, 4.0, periodic=True, spinless=False)
        kwargs = dict(
            n_epoch=1, lr=5e-2, threshold=5e-3, max_inner_iterations=8,
            dense_dressing=True, results_root=str(tmp_path),
            plot=False, log_metrics=False,
        )
        vqe = IQCC(H, **kwargs)
        vqe.run()
        # with the sidecar present, resume works and keeps the dressed H
        reloaded = IQCC(H, **kwargs, load_model=True)
        np.testing.assert_allclose(reloaded._dense_h, vqe._dense_h)
        # remove the sidecar: the load must now raise, not silently rebuild
        sidecars = glob.glob(
            os.path.join(str(tmp_path), "**", "*.dense.npy"), recursive=True
        )
        assert sidecars, "dense run should have written a .dense.npy sidecar"
        for s in sidecars:
            os.remove(s)
        with pytest.raises(RuntimeError, match="sidecar"):
            IQCC(H, **kwargs, load_model=True)


class TestDenseDressing:
    def test_dense_paulisum_roundtrip(self):
        from qsfh_tpu.ops.dense_dressing import dense_to_paulisum
        from qsfh_tpu.ops.lattice import fermi_hubbard
        from qsfh_tpu.ops.jw import jordan_wigner
        from qsfh_tpu.utils.dense import paulisum_to_dense

        H = jordan_wigner(fermi_hubbard(2, 2, 1.0, 4.0, periodic=True))
        n = 8
        M = paulisum_to_dense(H, n)
        back = dense_to_paulisum(M, n)
        M2 = paulisum_to_dense(back, n)
        np.testing.assert_allclose(M2, M, atol=1e-12)

    def test_dress_dense_matches_symbolic(self):
        """dense U^dag H U == the symbolic dress_hamiltonian (same
        reversed-application semantics) for a 3-generator layer."""
        from qsfh_tpu.ops.dense_dressing import dense_to_paulisum, dress_dense
        from qsfh_tpu.ops.dressing import dis_generators, dress_hamiltonian
        from qsfh_tpu.ops.lattice import fermi_hubbard
        from qsfh_tpu.ops.jw import jordan_wigner
        from qsfh_tpu.utils.dense import paulisum_to_dense

        H = jordan_wigner(fermi_hubbard(2, 2, 1.0, 4.0, periodic=True))
        n = 8
        gens = [P for _f, P in dis_generators(H)[:3]]
        taus = [0.3, -0.45, 0.7]
        sym, _d, _w = dress_hamiltonian(H, gens, taus)
        M = dress_dense(paulisum_to_dense(H, n), gens, taus, n)
        np.testing.assert_allclose(
            M, paulisum_to_dense(sym, n), atol=1e-10
        )
        # and the decomposition of the dense result matches term-wise
        back = dense_to_paulisum(M, n)
        np.testing.assert_allclose(
            paulisum_to_dense(back, n), paulisum_to_dense(sym, n), atol=1e-9
        )

    def test_iqcc_dense_mode_matches_symbolic_2x2(self, tmp_path):
        """One full IQCC epoch in dense mode reproduces the symbolic run
        (selection, energies, dressed spectrum)."""
        import jax
        from qsfh_tpu.algos.iqcc import IQCC
        from qsfh_tpu.ops.lattice import fermi_hubbard
        from qsfh_tpu.utils.dense import paulisum_to_dense

        runs = {}
        for dense in (False, True):
            vqe = IQCC(
                hamiltonian=fermi_hubbard(2, 2, 1.0, 4.0, periodic=True),
                n_epoch=2, lr=1e-2, threshold=5e-3,
                max_inner_iterations=16, dense_dressing=dense,
                ground_truth=True,
                results_root=str(tmp_path / ("d" if dense else "s")),
                tag="iqcc-dense-ab", plot=False, log_metrics=False,
            )
            vqe.run()
            runs[dense] = vqe
        a, b = runs[False], runs[True]
        assert a.selected_ops == b.selected_ops
        np.testing.assert_allclose(
            a.loss_history["epoch"], b.loss_history["epoch"], atol=1e-8
        )
        # dressed Hamiltonians agree as operators (dense mode keeps the
        # matrix as the authority and does NOT re-materialize the
        # PauliSum view -- it saturates toward 4^n terms at 12q+)
        n = a.n_qubits
        np.testing.assert_allclose(
            b._dense_h,
            paulisum_to_dense(a.current_hamiltonian, n),
            atol=1e-8,
        )


class TestInnerLoopLowerings:
    def test_state_scan_lowering_matches_unrolled(self):
        """>=12 selected rotations route through CompiledCircuit; the scan
        segment must be gate-for-gate equivalent to the unrolled chain."""
        rng = np.random.default_rng(7)
        n = 6
        vqe = IQCC.__new__(IQCC)  # only _state's fields are needed
        vqe.n_qubits = n
        vqe.dtype = jnp.complex128
        masks = []
        while len(masks) < 25:
            x = int(rng.integers(1, 1 << n))
            z = int(rng.integers(0, 1 << n))
            masks.append((x, z))
        taus = rng.normal(0, 0.7, len(masks))
        params = {
            "theta": jnp.asarray(rng.uniform(0, np.pi, n)),
            "phi": jnp.asarray(rng.uniform(-np.pi, np.pi, n)),
            "tau": jnp.asarray(taus),
        }
        scan_psi = vqe._state(params, masks)
        ref = product_state(params["theta"], params["phi"], n, jnp.complex128)
        for k, (x, z) in enumerate(masks):
            ref = gates.pauli_rotation(ref, n, x, z, params["tau"][k] / 2)
        np.testing.assert_allclose(
            np.asarray(scan_psi), np.asarray(ref), atol=1e-12
        )

    @pytest.mark.slow
    def test_lbfgs_inner_optimizer_converges(self, tmp_path):
        """inner_optimizer='lbfgs' reaches at least the adam epoch-1 energy
        in far fewer inner iterations on the 2x2 Hubbard subproblem."""
        energies = {}
        iters = {}
        for opt in ("adam", "lbfgs"):
            vqe = IQCC(
                hamiltonian=fermi_hubbard(2, 2, 1.0, 4.0, periodic=True),
                n_epoch=1, lr=1e-2, threshold=5e-3,
                max_inner_iterations=400, inner_optimizer=opt,
                ground_truth=True,
                results_root=str(tmp_path / opt),
                tag="iqcc-lbfgs-ab", plot=False, log_metrics=False,
            )
            vqe.run()
            energies[opt] = vqe.loss_history["epoch"][-1]
            iters[opt] = len(vqe.loss_history["iteration"])
        assert energies["lbfgs"] <= energies["adam"] + 1e-6
        assert iters["lbfgs"] < iters["adam"]

    def test_paulisum_to_dense_fast_matches_reference_builder(self):
        from qsfh_tpu.ops.dense_dressing import paulisum_to_dense_fast

        H = jordan_wigner(fermi_hubbard(2, 2, 1.0, 4.0, periodic=True))
        np.testing.assert_allclose(
            paulisum_to_dense_fast(H, 8), paulisum_to_dense(H, 8), atol=0
        )
