"""Split circuit mode (separately jitted stages) vs the unrolled step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qsfh_tpu.algos.adapt import ADAPT

KW = dict(
    n_epoch=0,
    threshold1=1e-2,
    threshold2=1e-2,
    x_dimension=2,
    y_dimension=2,
    n_electrons=4,
    n_spin_up=2,
    n_spin_down=2,
    tunneling=1.0,
    coulomb=6.0,
    ground_truth=True,
    plot=False,
    log_metrics=False,
)


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    a = ADAPT(**KW, results_root=str(tmp_path_factory.mktemp("u")))
    s = ADAPT(**KW, results_root=str(tmp_path_factory.mktemp("s")), circuit_mode="split")
    return a, s


class TestSplitMode:
    def test_step_outputs_match(self, pair):
        a, s = pair
        idx = (0, 5, 11)
        opt = optax.adam(1e-2)
        out_a = a._build_step(idx, opt)(
            jnp.asarray([0.2, -0.3, 0.1]), opt.init(jnp.asarray([0.2, -0.3, 0.1]))
        )
        out_s = s._build_step(idx, opt)(
            jnp.asarray([0.2, -0.3, 0.1]), opt.init(jnp.asarray([0.2, -0.3, 0.1]))
        )
        for i in (2, 3, 4, 5, 6):  # energy, Sz, S^2, fidelity, grad norm
            np.testing.assert_allclose(float(out_a[i]), float(out_s[i]), atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(out_a[0]), np.asarray(out_s[0]), atol=1e-8
        )

    def test_screening_matches(self, pair):
        a, s = pair
        idx = (0, 5, 11)
        g1 = np.asarray(a._screen_for(idx)(jnp.asarray([0.2, -0.3, 0.1])))
        g2 = np.asarray(s._screen_for(idx)(jnp.asarray([0.2, -0.3, 0.1])))
        np.testing.assert_allclose(g1, g2, atol=1e-10)

    def test_program_salt_is_inert(self, tmp_path):
        base = ADAPT(**KW, results_root=str(tmp_path / "a"), circuit_mode="split")
        salted = ADAPT(
            **KW,
            results_root=str(tmp_path / "b"),
            circuit_mode="split",
            program_salt=1e-7,
        )
        opt = optax.adam(1e-2)
        idx = (0, 5, 11)
        e0 = float(
            base._build_step(idx, opt)(
                jnp.asarray([0.2, -0.3, 0.1]), opt.init(jnp.asarray([0.2, -0.3, 0.1]))
            )[2]
        )
        e1 = float(
            salted._build_step(idx, opt)(
                jnp.asarray([0.2, -0.3, 0.1]), opt.init(jnp.asarray([0.2, -0.3, 0.1]))
            )[2]
        )
        np.testing.assert_allclose(e0, e1, atol=1e-9)


class TestTwoScanFwd:
    def test_two_scan_matches_merged_bitwise(self, tmp_path, monkeypatch):
        """QSFH_SPLIT_TWO_SCAN=1 (ansatz + network as two scans per stage,
        the fallback program shape for remote TPU compile services) is the
        same computation as the merged single-scan split step."""
        monkeypatch.delenv("QSFH_SPLIT_TWO_SCAN", raising=False)
        a = ADAPT(**KW, results_root=str(tmp_path / "m"), circuit_mode="split")
        idx = (0, 5, 11)
        opt = optax.adam(1e-2)
        th = jnp.asarray([0.2, -0.3, 0.1])
        out_m = a._build_step(idx, opt)(th, opt.init(th))
        monkeypatch.setenv("QSFH_SPLIT_TWO_SCAN", "1")
        b = ADAPT(**KW, results_root=str(tmp_path / "t"), circuit_mode="split")
        out_t = b._build_step(idx, opt)(th, opt.init(th))
        for i in (2, 3, 4, 5, 6):  # energy, Sz, S^2, fidelity, grad norm
            np.testing.assert_allclose(float(out_m[i]), float(out_t[i]), atol=1e-12)
        np.testing.assert_allclose(np.asarray(out_m[0]), np.asarray(out_t[0]), atol=1e-12)
