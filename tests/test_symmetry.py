"""C4 point-group symmetry analysis (linalg/symmetry.py).

The reference left its symmetry-adapted ground-subspace construction
dead-commented (/root/reference/linalg/exact_diagonalization.py:54-179)
and without fermionic permutation signs; these tests pin the working,
sign-correct version.
"""

import numpy as np
import pytest

from qsfh_tpu.linalg.exact import get_sparse_operator, jw_get_ground_space
from qsfh_tpu.linalg.symmetry import (
    c4_irrep_components,
    irrep_weights,
    mode_permutation,
    permute_modes,
    reflect_site_map,
    rot90_site_map,
    symmetry_adapted_ground_space,
    symmetry_adapted_states,
)
from qsfh_tpu.ops.lattice import fermi_hubbard


def _dense_h(nx, ny, u=4.0):
    return get_sparse_operator(fermi_hubbard(nx, ny, 1.0, u), 2 * nx * ny).toarray()


def _rand_state(n_qubits, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=1 << n_qubits) + 1j * rng.normal(size=1 << n_qubits)
    return v / np.linalg.norm(v)


class TestSiteMaps:
    def test_rot90_matches_reference_hand_table(self):
        # the reference's 3x3 mode table (exact_diagonalization.py:57-63)
        ref = {0: 0, 1: 1, 2: 12, 3: 13, 4: 6, 5: 7, 6: 2, 7: 3, 8: 14,
               9: 15, 10: 8, 11: 9, 12: 4, 13: 5, 14: 16, 15: 17, 16: 10, 17: 11}
        perm = mode_permutation(rot90_site_map(3, 3))
        assert all(perm[k] == v for k, v in ref.items())

    def test_reflections_match_reference_hand_tables(self):
        ref_x = {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 12, 7: 13, 8: 14,
                 9: 15, 10: 16, 11: 17, 12: 6, 13: 7, 14: 8, 15: 9, 16: 10, 17: 11}
        ref_y = {0: 0, 1: 1, 2: 4, 3: 5, 4: 2, 5: 3, 6: 6, 7: 7, 8: 10,
                 9: 11, 10: 8, 11: 9, 12: 12, 13: 13, 14: 16, 15: 17, 16: 14, 17: 15}
        px = mode_permutation(reflect_site_map(3, 3, "x"))
        py = mode_permutation(reflect_site_map(3, 3, "y"))
        assert all(px[k] == v for k, v in ref_x.items())
        assert all(py[k] == v for k, v in ref_y.items())

    def test_rot90_requires_square(self):
        with pytest.raises(ValueError):
            rot90_site_map(2, 3)


class TestSignedPermutation:
    def test_unitary_and_group_laws(self):
        psi = _rand_state(8)
        rot = mode_permutation(rot90_site_map(2, 2))
        s = psi.copy()
        for _ in range(4):
            s = permute_modes(s, rot)
            np.testing.assert_allclose(np.linalg.norm(s), 1.0, atol=1e-12)
        np.testing.assert_allclose(s, psi, atol=1e-12)  # r^4 = 1 incl. signs
        for axis in ("x", "y"):
            m = mode_permutation(reflect_site_map(2, 2, axis))
            np.testing.assert_allclose(
                permute_modes(permute_modes(psi, m), m), psi, atol=1e-12
            )

    @pytest.mark.parametrize("nx,ny", [(2, 2), (2, 3)])
    def test_signed_maps_commute_with_hamiltonian(self, nx, ny):
        h = _dense_h(nx, ny)
        psi = _rand_state(2 * nx * ny, seed=1)
        perms = [mode_permutation(reflect_site_map(nx, ny, a)) for a in ("x", "y")]
        if nx == ny:
            perms.append(mode_permutation(rot90_site_map(nx, ny)))
        for p in perms:
            np.testing.assert_allclose(
                permute_modes(h @ psi, p), h @ permute_modes(psi, p), atol=1e-10
            )

    def test_unsigned_reference_map_breaks_commutation(self):
        # the defect in the reference's dead code: amplitudes moved with no
        # fermionic reordering sign -> U H != H U (err ~1e1 on 2x2 rot90)
        h = _dense_h(2, 2)
        psi = _rand_state(8, seed=2)
        p = mode_permutation(rot90_site_map(2, 2))

        def commutator_err(signed):
            return np.abs(
                permute_modes(h @ psi, p, signed=signed)
                - h @ permute_modes(psi, p, signed=signed)
            ).max()

        assert commutator_err(False) > 1e8 * commutator_err(True)


class TestIrrepProjectors:
    def test_characters_resolve_identity_minus_e(self):
        # P_s + P_d + P_E = 1 on any vector
        psi = _rand_state(8, seed=3)
        rot = mode_permutation(rot90_site_map(2, 2))
        comps = c4_irrep_components(psi, lambda s: permute_modes(s, rot))
        np.testing.assert_allclose(
            comps["s"] + comps["d"] + comps["E"], psi, atol=1e-12
        )

    def test_projectors_are_idempotent_and_orthogonal(self):
        psi = _rand_state(8, seed=4)
        rot = mode_permutation(rot90_site_map(2, 2))
        rotate = lambda s: permute_modes(s, rot)
        comps = c4_irrep_components(psi, rotate)
        again = {k: c4_irrep_components(v, rotate)[k] for k, v in comps.items()}
        for k in comps:
            np.testing.assert_allclose(again[k], comps[k], atol=1e-12)
        assert abs(np.vdot(comps["s"], comps["d"])) < 1e-12


@pytest.mark.slow
class TestSymmetryAdaptedManifold3x3:
    """The working version of the reference's dead jw_get_ground_state_for_3x3."""

    @pytest.fixture(scope="class")
    def manifold(self):
        sp = get_sparse_operator(fermi_hubbard(3, 3, 1.0, 6.0), 18)
        energy, states, norms = symmetry_adapted_ground_space(sp, 9, 5, 4, 3, 3)
        return sp, energy, states, norms

    def test_energy_and_all_four_irreps_present(self, manifold):
        _, energy, states, norms = manifold
        np.testing.assert_allclose(energy, -5.562309, atol=1e-5)
        assert set(states) == {"s", "px", "py", "d"}
        assert all(n > 1e-3 for n in norms.values())

    def test_states_are_orthonormal_eigenstates(self, manifold):
        sp, energy, states, _ = manifold
        labels = list(states)
        gram = np.array(
            [[np.vdot(states[a], states[b]) for b in labels] for a in labels]
        )
        np.testing.assert_allclose(gram, np.eye(4), atol=1e-8)
        for v in states.values():
            hv = sp @ v
            np.testing.assert_allclose(np.vdot(v, hv).real, energy, atol=1e-6)
            assert np.linalg.norm(hv - energy * v) < 1e-5

    def test_irrep_characters(self, manifold):
        _, _, states, _ = manifold
        rot = mode_permutation(rot90_site_map(3, 3))
        mx = mode_permutation(reflect_site_map(3, 3, "x"))
        np.testing.assert_allclose(permute_modes(states["s"], rot), states["s"], atol=1e-8)
        np.testing.assert_allclose(permute_modes(states["d"], rot), -states["d"], atol=1e-8)
        # E doublet: rotation maps px into the span of (px, py) with full
        # weight on the partner; x-reflection fixes px and flips py
        rpx = permute_modes(states["px"], rot)
        assert abs(np.vdot(states["py"], rpx)) > 1 - 1e-8
        np.testing.assert_allclose(permute_modes(states["px"], mx), states["px"], atol=1e-8)
        np.testing.assert_allclose(permute_modes(states["py"], mx), -states["py"], atol=1e-8)

    def test_span_matches_gram_schmidt_manifold(self, manifold):
        sp, _, states, _ = manifold
        _, gs_states = jw_get_ground_space(sp, 9, 5, 4, n_states=4)
        # overlap matrix between the two orthonormal 4-frames: unitary iff
        # they span the same 4-dim subspace
        m = np.array([[np.vdot(a, b) for b in gs_states] for a in states.values()])
        np.testing.assert_allclose(m.conj().T @ m, np.eye(4), atol=1e-8)

    def test_irrep_weights_sum_to_manifold_fidelity(self, manifold):
        _, _, states, _ = manifold
        rng = np.random.default_rng(7)
        coeffs = rng.normal(size=4) + 1j * rng.normal(size=4)
        coeffs /= np.linalg.norm(coeffs)
        psi = sum(c * v for c, v in zip(coeffs, states.values()))
        w = irrep_weights(psi, states)
        np.testing.assert_allclose(sum(w.values()), 1.0, atol=1e-10)
        np.testing.assert_allclose(
            sorted(w.values()), sorted(abs(coeffs) ** 2), atol=1e-10
        )


class TestTranslations:
    def test_signed_translations_commute_with_hamiltonian(self):
        from qsfh_tpu.linalg.symmetry import translation_site_map

        h = _dense_h(2, 3)
        psi = _rand_state(12, seed=5)
        for dx, dy in [(1, 0), (0, 1), (1, 2)]:
            p = mode_permutation(translation_site_map(2, 3, dx, dy))
            np.testing.assert_allclose(
                permute_modes(h @ psi, p), h @ permute_modes(psi, p), atol=1e-10
            )

    def test_momentum_projectors_resolve_identity(self):
        from qsfh_tpu.linalg.symmetry import momentum_project, momentum_weights

        psi = _rand_state(8, seed=6)
        total = sum(
            momentum_project(psi, 2, 2, kx, ky) for kx in range(2) for ky in range(2)
        )
        np.testing.assert_allclose(total, psi, atol=1e-12)
        w = momentum_weights(psi, 2, 2)
        np.testing.assert_allclose(sum(w.values()), 1.0, atol=1e-12)

    def test_projected_component_is_translation_eigenvector(self):
        from qsfh_tpu.linalg.symmetry import momentum_project, translation_site_map

        psi = _rand_state(8, seed=7)
        comp = momentum_project(psi, 2, 2, 1, 0)
        assert np.linalg.norm(comp) > 1e-3  # generic state hits the sector
        tx = mode_permutation(translation_site_map(2, 2, 1, 0))
        np.testing.assert_allclose(
            permute_modes(comp, tx), np.exp(2j * np.pi * 1 / 2) * comp, atol=1e-12
        )

    def test_hubbard_ground_state_has_zero_momentum(self):
        from qsfh_tpu.linalg.symmetry import momentum_weights

        sp = get_sparse_operator(fermi_hubbard(2, 2, 1.0, 6.0), 8)
        _, psi = __import__(
            "qsfh_tpu.linalg.exact", fromlist=["jw_get_ground_state"]
        ).jw_get_ground_state(sp, 4, 2, 2)
        w = momentum_weights(psi, 2, 2)
        # the half-filled 2x2 ground state is a non-degenerate pure
        # k=(0,0) singlet -- same sector as the HVA Slater seed
        assert w[(0, 0)] > 1 - 1e-10
