"""Native C++ kernels (qsfh_tpu/native) vs the numpy fallback paths.

The merge kernel canonicalizes packed Pauli sums (the analog of OpenFermion
QubitOperator dict merging); the dress kernel emits the single-string iQCC
dressing term list (/root/reference/models/iqcc.py:175-180).  Both must be
bit-for-bit interchangeable with the numpy implementations.
"""

import numpy as np
import pytest

from qsfh_tpu import native
from qsfh_tpu.ops.dressing import dis_generators, dress_once
from qsfh_tpu.ops.pauli import PauliSum

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def _random_sum(rng, n, n_qubits=20):
    hi = 2**n_qubits
    return PauliSum(
        rng.integers(0, hi, n, dtype=np.uint64),
        rng.integers(0, hi, n, dtype=np.uint64),
        rng.standard_normal(n) + 1j * rng.standard_normal(n),
    )


class TestMergeTerms:
    def test_matches_numpy_lexsort_path(self):
        rng = np.random.default_rng(7)
        # small masks force many duplicate keys
        s = _random_sum(rng, 5000, n_qubits=5)
        got = native.merge_terms(s.x, s.z, s.c, 1e-12)
        assert got is not None
        gx, gz, gc = got

        ref = PauliSum(s.x.copy(), s.z.copy(), s.c.copy())
        order = np.lexsort((ref.z, ref.x))
        x, z, c = ref.x[order], ref.z[order], ref.c[order]
        new = np.empty(len(x), dtype=bool)
        new[0] = True
        new[1:] = (x[1:] != x[:-1]) | (z[1:] != z[:-1])
        gid = np.cumsum(new) - 1
        cc = np.zeros(gid[-1] + 1, dtype=np.complex128)
        np.add.at(cc, gid, c)
        keep = np.abs(cc) > 1e-12
        assert np.array_equal(gx, x[new][keep])
        assert np.array_equal(gz, z[new][keep])
        np.testing.assert_allclose(gc, cc[keep], rtol=0, atol=1e-13)

    def test_tol_drop(self):
        x = np.array([3, 3, 5], dtype=np.uint64)
        z = np.array([1, 1, 0], dtype=np.uint64)
        c = np.array([1.0, -1.0, 2.0], dtype=np.complex128)
        gx, gz, gc = native.merge_terms(x, z, c, 1e-12)
        assert list(gx) == [5] and list(gz) == [0]
        np.testing.assert_allclose(gc, [2.0])

    def test_empty(self):
        e = np.array([], dtype=np.uint64)
        gx, gz, gc = native.merge_terms(e, e, e.astype(np.complex128), 1e-12)
        assert len(gx) == len(gz) == len(gc) == 0


class TestDressEmit:
    def test_dress_once_native_equals_numpy(self, monkeypatch):
        rng = np.random.default_rng(3)
        H = _random_sum(rng, 4000, n_qubits=12)
        gens = dis_generators(H)
        assert gens, "no DIS generators from random H"
        P = gens[0][1]

        a = dress_once(H, P, 0.37)

        monkeypatch.setenv("QSFH_NO_NATIVE", "1")
        monkeypatch.setattr(native, "_tried", True)
        monkeypatch.setattr(native, "_lib", None)
        b = dress_once(H, P, 0.37)
        monkeypatch.setattr(native, "_tried", False)

        assert np.array_equal(a.x, b.x)
        assert np.array_equal(a.z, b.z)
        np.testing.assert_allclose(a.c, b.c, rtol=0, atol=1e-13)

    def test_fast_path_equals_generic_expression(self):
        rng = np.random.default_rng(11)
        H = _random_sum(rng, 500, n_qubits=8)
        # Hermitianize so the physics input is realistic
        H = (H + H.dagger()).simplify()
        for flips, P in dis_generators(H)[:3]:
            tau = 0.21
            fast = dress_once(H, P, tau)
            HP = H * P
            PH = P * H
            PHP = P * HP
            gen = (
                H
                + (np.sin(tau) * -0.5j) * (HP - PH)
                + (0.5 * (1.0 - np.cos(tau))) * (PHP - H)
            ).simplify()
            diff = (fast + (-1.0) * gen).simplify()
            assert len(diff) == 0 or np.abs(diff.c).max() < 1e-12
