"""Gate-level export path (qsfh_tpu/ops/export.py).

Checks that the portable CNOT-ladder decomposition of exp(-i theta P / 2)
(reference models/utils.py:58-83,106-137) is unitarily identical to the
engine's fused matrix-free pauli_rotation kernel, that the sparse-list /
angle-preprocessing exports match the reference's conventions, and that the
QASM writer emits parseable text.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from qsfh_tpu.engine import gates
from qsfh_tpu.ops import export
from qsfh_tpu.ops.jw import jordan_wigner
from qsfh_tpu.ops.pauli import PauliSum, qubit_operator
from qsfh_tpu.ops.pool import hubbard_interaction_pool_simplified


def _apply_plan(psi, n, ops):
    for name, wires, param in ops:
        if name == "ry":
            psi = gates.ry(psi, n, param, wires[0])
        elif name == "rx":
            psi = gates.rx(psi, n, param, wires[0])
        elif name == "rz":
            psi = gates.rz(psi, n, param, wires[0])
        elif name == "cx":
            psi = gates.cnot(psi, n, wires[0], wires[1])
        else:  # pragma: no cover
            raise AssertionError(name)
    return psi


def _random_state(rng, n):
    v = rng.standard_normal(2**n) + 1j * rng.standard_normal(2**n)
    return jnp.asarray(v / np.linalg.norm(v), dtype=jnp.complex128)


class TestPauliRotationGates:
    @pytest.mark.parametrize(
        "letters,wires",
        [
            (["Z"], [0]),
            (["X"], [2]),
            (["Y"], [1]),
            (["X", "Y"], [0, 3]),
            (["Y", "X", "X"], [1, 0, 2]),
            (["Z", "Y", "X", "Z"], [3, 1, 0, 2]),
        ],
    )
    def test_matches_fused_kernel(self, letters, wires):
        n = 4
        theta = 0.731
        rng = np.random.default_rng(5)
        psi = _random_state(rng, n)

        plan = export.pauli_rotation_gates(theta, (letters, wires))
        got = _apply_plan(psi, n, plan)

        P = qubit_operator(" ".join(f"{p}{q}" for p, q in zip(letters, wires)))
        want = gates.pauli_rotation(psi, n, int(P.x[0]), int(P.z[0]), theta / 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)

    def test_rejects_bad_input(self):
        with pytest.raises(ValueError):
            export.pauli_rotation_gates(0.1, (["X"], []))
        with pytest.raises(ValueError):
            export.pauli_rotation_gates(0.1, (["Q"], [0]))


class TestGeneratorRotation:
    def test_pool_generator_matches_engine(self):
        n = 8
        theta = 0.213
        gen = jordan_wigner(hubbard_interaction_pool_simplified(2, 2)[0])
        rng = np.random.default_rng(9)
        psi = _random_state(rng, n)

        plan = export.generator_rotation_gates(theta, gen)
        got = _apply_plan(psi, n, plan)
        want = gates.generator_rotation(psi, n, gen.rotation_terms(), theta)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)


class TestSparseExports:
    def test_sparse_list_roundtrip(self):
        op = qubit_operator("X0 Y2 Z5", 0.5) + qubit_operator("Z1", -2.0)
        got = dict()
        for letters, idx, c in export.to_sparse_list(op):
            got[(letters, tuple(idx))] = c
        assert got[("XYZ", (0, 2, 5))] == pytest.approx(0.5)
        assert got[("Z", (1,))] == pytest.approx(-2.0)

    def test_process_pauli_strings_angle_convention(self):
        # anti-Hermitian generator i * 0.3 * X0 Y1: angle scale (c*2j).real
        op = qubit_operator("X0 Y1", 0.3j)
        strings, coeffs = export.process_pauli_strings(op)
        assert strings == [(["X", "Y"], [0, 1])]
        np.testing.assert_allclose(coeffs, [-0.6])

    def test_to_sparse_pauli_op_needs_qiskit(self):
        op = qubit_operator("Z0")
        try:
            import qiskit  # noqa: F401

            pytest.skip("qiskit installed; exercised via real conversion")
        except ImportError:
            with pytest.raises(ImportError):
                export.to_sparse_pauli_op(op, 2)


class TestQasm:
    def test_emits_valid_text(self):
        plan = export.pauli_rotation_gates(0.5, (["X", "Z"], [0, 1]))
        qasm = export.to_qasm2(plan, 2)
        assert qasm.startswith("OPENQASM 2.0;")
        assert "qreg q[2];" in qasm
        assert qasm.count("cx q[0],q[1];") == 2
        assert "rz(0.5) q[1];" in qasm


class TestReviewFixes:
    def test_process_pauli_strings_skips_identity(self):
        op = qubit_operator("", 0.7j) + qubit_operator("X0 Y1", 0.3j)
        strings, coeffs = export.process_pauli_strings(op)
        assert strings == [(["X", "Y"], [0, 1])]
        np.testing.assert_allclose(coeffs, [-0.6])

    def test_qasm_coerces_numpy_angles(self):
        plan = [("rz", (0,), np.float64(0.5)), ("cx", (0, 1), 0.0)]
        qasm = export.to_qasm2(plan, 2)
        assert "rz(0.5) q[0];" in qasm
        assert "np.float64" not in qasm

    def test_generator_plan_skips_identity_and_imag_terms(self):
        # identity + purely imaginary string coeff: both produce no gates
        op = qubit_operator("", 2.0) + qubit_operator("Z0", 1e-15)
        assert export.generator_rotation_gates(0.5, op) == []
