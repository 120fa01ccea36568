"""Molecular pipeline + HEA driver tests.

Reference: /root/reference/molecules/__init__.py, /root/reference/models/vqe_hea.py.
Literature STO-3G values used as goldens (Szabo-Ostlund / standard tables).
"""

import numpy as np
import pytest

from qsfh_tpu.molecules import H2, HeH_Ion
from qsfh_tpu.molecules.integrals import (
    BasisFunction,
    boys,
    build_integrals,
    kinetic,
    overlap,
)


class TestIntegrals:
    def test_boys_limits(self):
        assert boys(0, 0.0) == pytest.approx(1.0)
        assert boys(2, 0.0) == pytest.approx(1.0 / 5.0)
        # F_0(x) = sqrt(pi/x)/2 * erf(sqrt(x)) for large x
        from scipy.special import erf

        x = 3.7
        assert boys(0, x) == pytest.approx(
            0.5 * np.sqrt(np.pi / x) * erf(np.sqrt(x)), rel=1e-12
        )

    def test_contracted_normalization(self):
        f = BasisFunction(
            np.zeros(3), (0, 0, 0), [3.42525091, 0.62391373, 0.16885540],
            [0.15432897, 0.53532814, 0.44463454],
        )
        assert overlap(f, f) == pytest.approx(1.0, abs=1e-10)
        p = BasisFunction(
            np.zeros(3), (1, 0, 0), [0.6362897, 0.1478601, 0.0480887],
            [0.15591627, 0.60768372, 0.39195739],
        )
        assert overlap(p, p) == pytest.approx(1.0, abs=1e-10)

    def test_h2_sto3g_szabo_values(self):
        """Szabo-Ostlund table 3.5-ish cross-check at R = 1.4 Bohr."""
        from qsfh_tpu.molecules.basis import build_basis

        atoms = [("H", np.array([0.0, 0.0, 0.0])), ("H", np.array([0.0, 0.0, 1.4]))]
        funcs, charges = build_basis(atoms)
        S, T, V, eri = build_integrals(funcs, charges)
        assert S[0, 1] == pytest.approx(0.6593, abs=2e-4)
        assert T[0, 0] == pytest.approx(0.7600, abs=2e-4)
        assert eri[0, 0, 0, 0] == pytest.approx(0.7746, abs=2e-4)  # (11|11)


class TestMolecules:
    def test_h2_energies(self):
        m = H2(r=0.7414)
        assert m.n_qubits == 4
        assert m.n_electrons == 2
        assert m.hf_energy == pytest.approx(-1.11668, abs=5e-4)
        assert m.fci_energy == pytest.approx(-1.13727, abs=5e-4)
        assert m.fci_energy < m.hf_energy

    def test_heh_ion(self):
        m = HeH_Ion(r=0.772)
        assert m.charge == 1
        assert m.n_electrons == 2
        assert m.fci_energy == pytest.approx(-2.8510, abs=2e-3)

    def test_hamiltonian_hermitian(self):
        from qsfh_tpu.ops.fermion import hermitian_conjugated, normal_ordered
        from qsfh_tpu.ops.jw import jordan_wigner

        m = H2(r=0.8)
        H = m.get_molecular_hamiltonian()
        assert normal_ordered(hermitian_conjugated(H)).isclose(normal_ordered(H), tol=1e-8)
        assert jordan_wigner(H).is_hermitian(tol=1e-8)


@pytest.mark.slow
class TestHEA:
    def test_h2_converges_toward_fci(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from qsfh_tpu.algos.hea import VQE

        m = H2(r=0.8)
        vqe = VQE(
            m, n_epoch=220, reps=3, lr=1e-1, threshold=2e-3, seed=1,
            results_root=str(tmp_path), plot=False, log_metrics=False,
        )
        losses = vqe.run()
        # variational bound + real optimization progress
        assert min(losses) >= m.fci_energy - 1e-6
        assert losses[-1] < m.hf_energy + 0.02  # beats/approaches mean-field


def test_molecule_names_match_factories():
    # artifact tags identify the molecule (algos/hea.py); names reproduce
    # the factory spellings via decreasing-Z element ordering + charge mark
    from qsfh_tpu.molecules import Molecule

    def name(geometry, charge=0):
        return Molecule(geometry, charge=charge, run_fci=False).name

    assert name([("H", (0, 0, 0)), ("H", (0, 0, 0.8))]) == "H2"
    assert name([("He", (0, 0, 0)), ("H", (0, 0, 1.0))], charge=1) == "HeH+"
    assert name([("Li", (0, 0, 0)), ("H", (0, 0, 1.6))]) == "LiH"
    assert name(
        [("H", (0, 0, -1.3)), ("Be", (0, 0, 0)), ("H", (0, 0, 1.3))]
    ) == "BeH2"
    assert name([("H", (0, 0, i * 1.0)) for i in range(4)]) == "H4"


@pytest.mark.slow
def test_h2o_matches_literature():
    """First p-block heavy atom (O, STO-3G exponents up to 130.7): RHF at
    the experimental geometry (r=0.9572 A, 104.52 deg) reproduces the
    literature STO-3G value -74.962927 (Szabo & Ostlund); FCI adds the
    expected ~50 mHa of correlation (pinned as a regression golden)."""
    from qsfh_tpu.molecules import H2O

    m = H2O(r=0.9572, angle_deg=104.52)
    assert m.name == "OH2"
    assert m.n_orbitals == 7 and m.n_electrons == 10 and m.n_qubits == 14
    assert m.hf_energy == pytest.approx(-74.962927, abs=5e-5)
    assert m.fci_energy == pytest.approx(-75.012404, abs=5e-5)
    assert -0.065 < m.fci_energy - m.hf_energy < -0.035
