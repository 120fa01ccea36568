"""H4 / H6 FCI regressions (VERDICT r1 #9).

The reference exposes H4/H6 chain factories (/root/reference/molecules/
__init__.py:37-45) but round 1 only validated H2/HeH+/LiH/BeH2 against
literature.  Two independent anchors close the gap:

1. dissociation limit vs an ANALYTIC literature value: at r=8 A the chain
   FCI energy must equal n_atoms x E(H, STO-3G) = n x (-0.4665819) Ha
   (the hydrogen-atom STO-3G energy is exact in that basis; restricted HF
   fails this limit by construction, FCI must hit it);
2. method-independence: the sector-Lanczos FCI equals a dense full-space
   diagonalization of the JW-mapped Hamiltonian built from the same
   integrals.

Near-equilibrium energies are pinned as regression goldens.
"""

import numpy as np
import pytest

from qsfh_tpu.molecules import H4, H6

E_H_STO3G = -0.4665819  # analytic hydrogen-atom STO-3G ground energy


class TestDissociationLimit:
    def test_h4_dissociates_to_four_atoms(self):
        m = H4(8.0)
        assert m.fci_energy == pytest.approx(4 * E_H_STO3G, abs=1e-5)
        # restricted HF cannot reach the limit (ionic contamination)
        assert m.hf_energy > m.fci_energy + 1.0

    def test_h6_dissociates_to_six_atoms(self):
        m = H6(8.0)
        assert m.fci_energy == pytest.approx(6 * E_H_STO3G, abs=1e-5)


class TestEquilibriumRegression:
    def test_h4_golden(self):
        m = H4(0.9)
        assert m.hf_energy == pytest.approx(-2.124260, abs=5e-5)
        assert m.fci_energy == pytest.approx(-2.180317, abs=5e-5)
        assert m.fci_energy < m.hf_energy

    @pytest.mark.slow
    def test_h6_golden(self):
        m = H6(0.9)
        assert m.hf_energy == pytest.approx(-3.160743, abs=5e-5)
        assert m.fci_energy == pytest.approx(-3.244542, abs=5e-5)


class TestDenseParity:
    # the H6 leg dense-diagonalizes 2^12 x 2^12 (~35 s); H4 carries the
    # same method-parity contract in the fast profile
    @pytest.mark.parametrize(
        "factory,r",
        [(H4, 0.9), pytest.param(H6, 1.1, marks=pytest.mark.slow)],
    )
    def test_sector_fci_matches_dense_diagonalization(self, factory, r):
        """Sector-Lanczos FCI == dense 2^n eigensolve of the JW Hamiltonian
        (independent method, same integrals)."""
        from qsfh_tpu.ops.jw import jordan_wigner
        from qsfh_tpu.utils.dense import paulisum_to_dense

        m = factory(r)
        qubit_h = jordan_wigner(m.get_molecular_hamiltonian())
        n = qubit_h.n_qubits()
        H = paulisum_to_dense(qubit_h, n)
        e_dense = float(np.linalg.eigvalsh(H)[0])
        assert m.fci_energy == pytest.approx(e_dense, abs=1e-8)
