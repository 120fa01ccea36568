"""CLI smoke tests (argument plumbing; tiny configs)."""

import json
import os

import pytest

from qsfh_tpu.cli import main


class TestCLI:
    def test_ed_subcommand(self, tmp_path, capsys, monkeypatch):
        monkeypatch.chdir(tmp_path)
        main(
            [
                "ed",
                "--x-dimension", "2",
                "--y-dimension", "2",
                "--results-root", str(tmp_path),
            ]
        )
        out = capsys.readouterr().out
        assert "ground energy" in out
        assert "-1.6346" in out  # 2x2 t=1 U=6 half filling

    def test_hva_subcommand_short_run(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        main(
            [
                "hva",
                "--n-epoch", "3",
                "--reps", "2",
                "--lr", "5e-2",
                "--no-plot",
                "--results-root", str(tmp_path),
            ]
        )
        saved = os.listdir(tmp_path / "saved_model")
        assert any(f.startswith("HVA-2x2") for f in saved)
        results = json.load(
            open(tmp_path / "vqe_results" / [f for f in os.listdir(tmp_path / "vqe_results") if f.endswith(".json")][0])
        )
        assert len(results["loss"]) == 3

    def test_unknown_molecule_exits(self):
        with pytest.raises(SystemExit):
            main(["hea", "--molecule", "Unobtainium"])


class TestSymmetryCLI:
    def test_symmetry_subcommand(self, tmp_path, capsys, monkeypatch):
        monkeypatch.chdir(tmp_path)
        main(
            [
                "symmetry",
                "--x-dimension", "2",
                "--y-dimension", "2",
                "--results-root", str(tmp_path),
            ]
        )
        out = capsys.readouterr().out
        blob = json.loads(out[out.index("{"):])
        assert blob["energy"] == pytest.approx(-1.6346, abs=1e-3)
        # non-degenerate 2x2 ground state: pure d-wave, pure k=(0,0)
        assert blob["c4_irrep_norms"]["d"] == pytest.approx(1.0, abs=1e-6)
        assert blob["momentum_weights"]["(0,0)"] == pytest.approx(1.0, abs=1e-8)


class TestDynamicsCLI:
    def test_dynamics_subcommand(self, tmp_path, capsys, monkeypatch):
        monkeypatch.chdir(tmp_path)
        main(
            [
                "dynamics",
                "--x-dimension", "2",
                "--y-dimension", "2",
                "--coulomb", "4",
                "--dt", "0.05",
                "--t-final", "0.5",
                "--initial", "neel",
                "--results-root", str(tmp_path),
            ]
        )
        out = capsys.readouterr().out
        blob = json.loads(out.splitlines()[-2])
        # Neel quench: <H> = 0 exactly; recorded drift is Trotter error
        assert abs(blob["H"]) < 0.05
        assert abs(blob["Sz"]) < 1e-8
        data = json.load(open(tmp_path / "dynamics.json"))
        assert len(data["times"]) == 10 == len(data["H"])

    def test_ite_subcommand(self, tmp_path, capsys, monkeypatch):
        monkeypatch.chdir(tmp_path)
        main(
            [
                "ite",
                "--x-dimension", "2",
                "--y-dimension", "2",
                "--coulomb", "6",
                "--dbeta", "0.05",
                "--order", "6",
                "--n-steps", "800",
                "--variance-tol", "1e-9",
                "--initial", "neel",
                "--results-root", str(tmp_path),
            ]
        )
        out = capsys.readouterr().out
        blob = json.loads(out.splitlines()[-1])
        data = json.load(open(tmp_path / "ite.json"))
        assert data == blob
        assert blob["variance"] < 1e-9  # hit the certificate, not the cap
        assert blob["energy"] == pytest.approx(-1.6346030549, abs=1e-5)


class TestSpectralCLI:
    @pytest.mark.parametrize("kind", ["particle", "spin"])
    def test_spectral_subcommand(self, tmp_path, capsys, monkeypatch, kind):
        monkeypatch.chdir(tmp_path)
        main(
            [
                "spectral",
                "--x-dimension", "2",
                "--y-dimension", "2",
                "--kind", kind,
                "--kx", "1",
                "--ky", "1",
                "--m", "40",
                "--results-root", str(tmp_path),
            ]
        )
        out = json.loads(capsys.readouterr().out)
        assert out["kind"] == kind
        assert len(out["poles"]) == len(out["weights"]) > 0
        assert sum(out["weights"]) == pytest.approx(out["norm2"], abs=1e-6)
        disk = json.load(open(tmp_path / "spectral.json"))
        assert len(disk["A"]) == len(disk["omegas"]) == 201


class TestMultistartFlagWarning:
    """ADVICE r2: `multistart --molecule` must warn (not silently ignore)
    when HVA-only lattice/init flags are set alongside the HEA path."""

    def _run(self, monkeypatch, tmp_path, argv):
        import qsfh_tpu.cli as cli

        calls = {}

        class FakeMS:
            def __init__(self, *a, **k):
                calls["kwargs"] = k

            def run(self):
                import numpy as np

                return {
                    "best_index": 0,
                    "best_energy": -1.0,
                    "final_energies": np.array([-1.0]),
                }

        monkeypatch.chdir(tmp_path)
        monkeypatch.setattr(
            "qsfh_tpu.algos.multistart.MultistartHEA", FakeMS
        )
        cli.main(argv)
        return calls

    def test_warns_on_ignored_lattice_flag(self, monkeypatch, tmp_path):
        with pytest.warns(UserWarning, match="HVA-only flags are ignored"):
            self._run(
                monkeypatch, tmp_path,
                ["multistart", "--molecule", "H2", "--n-starts", "1",
                 "--n-epoch", "1", "--x-dimension", "3"],
            )

    def test_warns_on_init_scale(self, monkeypatch, tmp_path):
        with pytest.warns(UserWarning, match="init_scale"):
            self._run(
                monkeypatch, tmp_path,
                ["multistart", "--molecule", "H2", "--n-starts", "1",
                 "--n-epoch", "1", "--init-scale", "0.5"],
            )

    def test_no_warning_with_defaults(self, monkeypatch, tmp_path, recwarn):
        self._run(
            monkeypatch, tmp_path,
            ["multistart", "--molecule", "H2", "--n-starts", "1",
             "--n-epoch", "1"],
        )
        assert not [
            w for w in recwarn.list
            if "HVA-only flags" in str(w.message)
        ]
