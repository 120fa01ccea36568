"""Checkpoint filename identity: t=1 and t=1.0 must name the SAME run.

VERDICT r1 weak #6: ``config_tag`` interpolated raw Python reprs, so a
resume constructed with ``tunneling=1.0`` silently missed the checkpoint
written by ``tunneling=1`` (a trap the round-1 3x3 demo actually hit).
"""

import os

import numpy as np
import pytest

from qsfh_tpu.io import checkpoint as ckpt


class TestConfigTagNormalization:
    def test_int_float_same_tag(self):
        a = ckpt.config_tag("HVA", 2, 2, 1, 6, 4, 2, 2)
        b = ckpt.config_tag("HVA", 2, 2, 1.0, 6.0, 4, 2, 2)
        assert a == b

    def test_numpy_scalars_same_tag(self):
        a = ckpt.config_tag("HVA", 2, 2, np.float64(1.0), np.int64(6), 4)
        b = ckpt.config_tag("HVA", 2, 2, 1, 6, 4)
        assert a == b

    def test_noninteger_float_preserved(self):
        t = ckpt.config_tag("HVA", 2, 2, 1.5, 6.25, 4)
        assert "t=1.5" in t and "U=6.25" in t

    def test_extras_normalized(self):
        a = ckpt.config_tag("HVA", 2, 2, 1, 6, 4, reps=10.0)
        b = ckpt.config_tag("HVA", 2, 2, 1, 6, 4, reps=10)
        assert a == b


class TestLegacyResolve:
    def test_resolves_legacy_float_styled_file(self, tmp_path):
        """Artifacts written before normalization used float reprs."""
        legacy = tmp_path / "HVA-2x2 (t=1.0, U=6.0, n_electrons=4).json"
        legacy.write_text("{}")
        canonical = str(tmp_path / "HVA-2x2 (t=1, U=6, n_electrons=4).json")
        assert ckpt.resolve(canonical) == str(legacy)

    def test_prefers_canonical_when_both_exist(self, tmp_path):
        legacy = tmp_path / "HVA-2x2 (t=1.0, U=6, n_electrons=4).json"
        legacy.write_text("{}")
        canonical = tmp_path / "HVA-2x2 (t=1, U=6, n_electrons=4).json"
        canonical.write_text("{}")
        assert ckpt.resolve(str(canonical)) == str(canonical)

    def test_missing_stays_canonical(self, tmp_path):
        p = str(tmp_path / "HVA-2x2 (t=1, U=6, n_electrons=4).json")
        assert ckpt.resolve(p) == p


class TestMixedResumeEndToEnd:
    def test_resume_with_float_ctor_args(self, tmp_path):
        """Train with int t/U, resume with float t/U: same checkpoint."""
        from qsfh_tpu.algos.hva import HVA

        root = str(tmp_path)
        first = HVA(
            n_epoch=2, reps=2, lr=5e-2, x_dimension=2, y_dimension=2,
            n_electrons=4, n_spin_up=2, n_spin_down=2,
            tunneling=1, coulomb=6,
            results_root=root, plot=False, log_metrics=False,
        )
        first.run()
        first.save_model()
        resumed = HVA(
            n_epoch=2, reps=2, lr=5e-2, x_dimension=2, y_dimension=2,
            n_electrons=4, n_spin_up=2, n_spin_down=2,
            tunneling=1.0, coulomb=6.0,
            load_model=True,
            results_root=root, plot=False, log_metrics=False,
        )
        assert len(resumed.results["loss"]) == len(first.results["loss"])
        for k in first.params:
            np.testing.assert_allclose(
                np.asarray(resumed.params[k]), np.asarray(first.params[k])
            )


def test_shared_ed_cache_read_through(tmp_path, monkeypatch):
    """With QSFH_ED_CACHE_DIR set, a second results_root must satisfy its
    ED lookup from the shared cache (no second Lanczos solve) while still
    writing its own per-root artifact."""
    import qsfh_tpu.algos.base as base
    from qsfh_tpu.algos.base import HubbardProblem

    monkeypatch.setenv("QSFH_ED_CACHE_DIR", str(tmp_path / "shared"))
    pa = HubbardProblem(2, 2, 1.0, 4.0, 4, 2, 2)
    pa.results_root = str(tmp_path / "a")
    e_a, _ = pa.ground_state()

    def boom(*a, **k):
        raise AssertionError("second root must not re-solve")

    monkeypatch.setattr(base, "lanczos_ground_state", boom)
    pb = HubbardProblem(2, 2, 1.0, 4.0, 4, 2, 2)
    pb.results_root = str(tmp_path / "b")
    e_b, _ = pb.ground_state()
    assert e_a == e_b
    assert os.path.exists(pb.ground_state_path())
