"""VQD excited-state driver (algos/vqd.py) vs the dense spectrum."""

import numpy as np
import pytest

from qsfh_tpu.algos.vqd import VQD
from qsfh_tpu.molecules import H2
from qsfh_tpu.ops.jw import jordan_wigner
from qsfh_tpu.utils.dense import paulisum_to_dense


@pytest.fixture(scope="module")
def h2():
    return H2(r=0.8)


@pytest.mark.slow
def test_vqd_smoke_two_levels(h2, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    vqd = VQD(h2, n_levels=2, n_epoch=30, reps=2, lr=1e-1, beta=5.0,
              seed=0, results_root=str(tmp_path), log_metrics=True)
    energies = vqd.run()
    assert len(energies) == 2 and len(vqd.states) == 2
    assert all(np.isfinite(e) for e in energies)
    # variational bound on the ground level
    assert energies[0] >= h2.fci_energy - 1e-9
    import os
    assert os.path.exists(vqd.result_filepath)


@pytest.mark.slow
def test_vqd_recovers_dense_spectrum(h2, tmp_path, monkeypatch):
    """Levels converge to the lowest full-Fock-space eigenvalues (the
    first excited level of H2/STO-3G is the 3-fold degenerate triplet --
    deflation finds an orthogonal copy at the same energy)."""
    monkeypatch.chdir(tmp_path)
    h = paulisum_to_dense(jordan_wigner(h2.get_molecular_hamiltonian()), 4)
    evals = np.linalg.eigvalsh(h)

    vqd = VQD(h2, n_levels=2, n_epoch=350, reps=3, lr=1e-1, beta=5.0,
              seed=1, results_root=str(tmp_path), log_metrics=False)
    energies = vqd.run()
    np.testing.assert_allclose(energies, evals[:2], atol=5e-4)
    # found states are mutually orthogonal
    assert abs(np.vdot(vqd.states[0], vqd.states[1])) < 1e-2


@pytest.mark.slow
def test_sector_penalty_targets_odd_electron_state(h2, tmp_path, monkeypatch):
    """penalty_ops pin symmetry sectors: with weight*(N-1)^2 added, VQD
    converges to the lowest ODD-electron eigenstate -- a state plain
    deflation would never surface first (the N=2 ground and triplet lie
    below it)."""
    monkeypatch.chdir(tmp_path)
    from qsfh_tpu.ops.fermion import FermionOperator

    h = paulisum_to_dense(jordan_wigner(h2.get_molecular_hamiltonian()), 4)
    idx = [i for i in range(16) if bin(i).count("1") == 1]
    ev_n1 = np.linalg.eigvalsh(h[np.ix_(idx, idx)])

    n_op = FermionOperator.zero()
    for q in range(4):
        n_op += FermionOperator(((q, 1), (q, 0)))
    vqd = VQD(h2, n_levels=1, n_epoch=400, reps=3, lr=1e-1, beta=5.0, seed=2,
              results_root=str(tmp_path), log_metrics=False,
              penalty_ops=[(n_op, 1.0, 5.0)])
    energies = vqd.run()
    np.testing.assert_allclose(energies[0], ev_n1[0], atol=1e-4)


@pytest.mark.slow
def test_hf_seeded_level_converges_fast(h2, tmp_path, monkeypatch):
    """initial_occupied seeds the circuit inside the target sector: from
    the HF determinant (qubits 0,1) a reps=2 ansatz reaches FCI-1e-3 in
    200 epochs -- far faster than the random vacuum start."""
    monkeypatch.chdir(tmp_path)
    vqd = VQD(h2, n_levels=1, n_epoch=200, reps=2, lr=5e-2, seed=0,
              results_root=str(tmp_path), log_metrics=False,
              initial_occupied=(0, 1))
    energies = vqd.run()
    assert energies[0] == pytest.approx(h2.fci_energy, abs=1e-3)
    assert energies[0] >= h2.fci_energy - 1e-9


@pytest.mark.slow
def test_hva_ansatz_deflation_walks_symmetric_sector(tmp_path, monkeypatch):
    """Ansatz injection: deflating the momentum-conserving HVA circuit
    finds the ground state AND the first k=(0,0) excited state of the
    2x2 Hubbard sector, while (correctly) skipping the k=(1,1) level at
    -1.2915 that the ansatz cannot represent -- the generic HEA plateaus
    ~200 mHa off on the same problem."""
    monkeypatch.chdir(tmp_path)
    import jax
    import jax.numpy as jnp

    from qsfh_tpu.algos.hva import HVA
    from qsfh_tpu.linalg.symmetry import momentum_weights

    hva = HVA(n_epoch=0, reps=6, lr=3e-2, x_dimension=2, y_dimension=2,
              n_electrons=4, n_spin_up=2, n_spin_down=2, tunneling=1, coulomb=6,
              results_root=str(tmp_path), plot=False, log_metrics=False)

    def init(key):
        ks = jax.random.split(key, len(hva.params))
        return {k: 0.05 * jax.random.normal(kk, np.asarray(v).shape,
                                            dtype=np.asarray(v).dtype)
                for kk, (k, v) in zip(ks, hva.params.items())}

    vqd = VQD(hva.problem.fermion_hamiltonian, n_qubits=8, n_levels=2,
              n_epoch=1500, lr=3e-2, beta=6.0, seed=0, threshold=5e-4,
              results_root=str(tmp_path), log_metrics=False,
              circuit=hva.circuit, init_params=init)
    energies = vqd.run()
    np.testing.assert_allclose(energies[0], -1.634603, atol=1e-4)
    np.testing.assert_allclose(energies[1], -0.695604, atol=1e-4)
    for s in vqd.states:
        assert momentum_weights(s, 2, 2)[(0, 0)] > 0.999


def test_zero_epoch_level_reports_initial_energy(h2, tmp_path, monkeypatch):
    """n_epoch=0 must evaluate the init params, not crash on an empty
    history; the recorded energy is <H> of the stored state exactly."""
    monkeypatch.chdir(tmp_path)
    import jax.numpy as jnp

    vqd = VQD(h2, n_levels=1, n_epoch=0, reps=2, seed=0,
              results_root=str(tmp_path), log_metrics=False)
    energies = vqd.run()
    assert len(energies) == 1 and np.isfinite(energies[0])
    e_state = float(vqd.observable.expectation(jnp.asarray(vqd.states[0])))
    assert energies[0] == pytest.approx(e_state, abs=1e-12)
