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
