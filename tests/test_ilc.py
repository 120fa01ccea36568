"""iQCC-ILC epoch machinery (ops/ilc.py).

The ILC step exists because the round-4 dense campaign measured plain
iQCC converging geometrically to a fixed point 0.2477 Ha above ED at
2x3 (benchmarks/demo_iqcc_2x3_r4/dense.json); these tests pin the three
exactness properties the step relies on, on small lattices where dense
f64 ground truth is cheap.
"""

import numpy as np
import pytest

from qsfh_tpu.algos.iqcc import IQCC, product_state
from qsfh_tpu.ops.dense_dressing import dense_dis_generators
from qsfh_tpu.ops.ilc import (
    fold_ilc_dense,
    greedy_anticommuting_set,
    ilc_scores,
    ilc_step_dense,
    pauli_anticommute,
    string_column,
)
from qsfh_tpu.ops.jw import jordan_wigner
from qsfh_tpu.ops.lattice import fermi_hubbard
from qsfh_tpu.ops.pauli import PauliSum
from qsfh_tpu.utils.dense import paulisum_to_dense


@pytest.fixture(scope="module")
def h22():
    n = 8
    H = paulisum_to_dense(
        jordan_wigner(fermi_hubbard(2, 2, 1.0, 4.0, periodic=True)), n
    )
    return H, n, float(np.linalg.eigvalsh(H)[0])


def _qmf(n, n_el):
    theta = np.array([np.pi] * n_el + [0.0] * (n - n_el))
    return np.asarray(product_state(theta, np.zeros(n), n, np.complex128))


class TestPrimitives:
    def test_anticommute_matches_dense(self, h22):
        _, n, _ = h22
        rng = np.random.default_rng(7)
        for _ in range(20):
            x1, z1 = map(int, rng.integers(1, 1 << n, 2))
            x2, z2 = map(int, rng.integers(1, 1 << n, 2))
            P1 = paulisum_to_dense(PauliSum([x1], [z1], [1.0]), n)
            P2 = paulisum_to_dense(PauliSum([x2], [z2], [1.0]), n)
            anti = np.allclose(P1 @ P2 + P2 @ P1, 0)
            assert pauli_anticommute(x1, z1, x2, z2) == anti

    def test_string_column_matches_dense(self, h22):
        _, n, _ = h22
        rng = np.random.default_rng(3)
        psi = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
        P = PauliSum([int(rng.integers(1, 1 << n))], [int(rng.integers(0, 1 << n))], [1.0])
        np.testing.assert_allclose(
            string_column(P, psi, n), paulisum_to_dense(P, n) @ psi, atol=1e-12
        )

    def test_greedy_set_mutually_anticommutes(self, h22):
        H, n, _ = h22
        dis, _ = dense_dis_generators(H, n)
        gens = [P for _, P in dis]
        psi = _qmf(n, 4)
        scores, _, _, _ = ilc_scores(H, psi, gens, n)
        sel = greedy_anticommuting_set(gens, scores, cap=16)
        assert len(sel) >= 2
        for i in sel:
            for j in sel:
                if i != j:
                    assert pauli_anticommute(
                        int(gens[i].x[0]), int(gens[i].z[0]),
                        int(gens[j].x[0]), int(gens[j].z[0]),
                    )

    def test_fold_matches_zgemm(self, h22):
        H, n, _ = h22
        dis, _ = dense_dis_generators(H, n)
        psi = _qmf(n, 4)
        gens = [P for _, P in dis]
        scores, _, _, _ = ilc_scores(H, psi, gens, n)
        sel = greedy_anticommuting_set(gens, scores, cap=8)
        sub = [gens[i] for i in sel]
        rng = np.random.default_rng(11)
        a = rng.normal(size=len(sub) + 1)
        a /= np.linalg.norm(a)
        # reference: materialize U and conjugate
        dim = 1 << n
        U = a[0] * np.eye(dim, dtype=np.complex128)
        for k, P in enumerate(sub):
            U += -1j * a[k + 1] * paulisum_to_dense(P, n)
        np.testing.assert_allclose(U.conj().T @ U, np.eye(dim), atol=1e-12)
        np.testing.assert_allclose(
            fold_ilc_dense(H, sub, a, n), U.conj().T @ H @ U, atol=1e-10
        )


class TestStep:
    def test_monotone_exact_and_spectrum_preserving(self, h22):
        H, n, exact = h22
        psi = _qmf(n, 4)
        Hd = H
        e_prev = float(np.real(np.vdot(psi, H @ psi)))
        for _ in range(3):
            dis, _ = dense_dis_generators(Hd, n)
            Hd2, e_pred, info = ilc_step_dense(
                Hd, psi, [P for _, P in dis], n, cap=16
            )
            # predicted subspace eigenvalue == realized folded energy
            e_fold = float(np.real(np.vdot(psi, Hd2 @ psi)))
            assert abs(e_fold - e_pred) < 1e-9
            # monotone descent
            assert e_pred <= e_prev + 1e-12
            # unitary frame change: spectrum untouched
            assert abs(np.linalg.eigvalsh(Hd2)[0] - exact) < 1e-9
            Hd, e_prev = Hd2, e_pred

    @pytest.mark.slow
    def test_iqcc_ilc_driver_beats_plain_at_fixed_epochs(self, tmp_path):
        """2x2 at 3 epochs: the ILC variant must reach at least as low an
        energy as plain dense iQCC (monotone extra folds), and the run
        must execute end-to-end through the driver surface."""
        import os

        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            common = dict(
                hamiltonian=fermi_hubbard(2, 2, 1.0, 4.0, periodic=True),
                n_epoch=3, lr=5e-2, threshold=1e-2,
                max_inner_iterations=60, dense_dressing=True,
                ground_truth=True, plot=False, log_metrics=False,
            )
            plain = IQCC(tag="plain", **common)
            plain.run()
            boosted = IQCC(tag="ilc", ilc=True, ilc_cap=16, **common)
            boosted.run()
            assert (
                boosted.loss_history["epoch"][-1]
                <= plain.loss_history["epoch"][-1] + 1e-9
            )
            assert any(s.startswith("ILC[") for s in boosted.selected_ops)
        finally:
            os.chdir(cwd)

    def test_ilc_requires_dense(self):
        with pytest.raises(ValueError, match="dense_dressing"):
            IQCC(
                hamiltonian=fermi_hubbard(2, 2, 1.0, 4.0, periodic=True),
                n_epoch=1, lr=1e-2, threshold=1e-2, ilc=True,
                ground_truth=False, plot=False, log_metrics=False,
            )

    def test_candidate_sets_anticommute_and_dedup(self, h22):
        from qsfh_tpu.ops.ilc import candidate_anticommuting_sets

        H, n, _ = h22
        dis, _ = dense_dis_generators(H, n)
        gens = [P for _, P in dis]
        psi = _qmf(n, 4)
        scores, _, _, _ = ilc_scores(H, psi, gens, n)
        cands = candidate_anticommuting_sets(gens, scores, cap=8, restarts=8)
        assert cands, "at least the greedy set"
        seen = set()
        for c in cands:
            key = tuple(sorted(c))
            assert key not in seen, "deduplicated"
            seen.add(key)
            for i in c:
                for j in c:
                    if i != j:
                        assert pauli_anticommute(
                            int(gens[i].x[0]), int(gens[i].z[0]),
                            int(gens[j].x[0]), int(gens[j].z[0]),
                        )
        greedy = tuple(sorted(greedy_anticommuting_set(gens, scores, 8)))
        assert greedy in seen
