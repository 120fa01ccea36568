"""Explicit shard_map engine vs the single-shard engine (8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from qsfh_tpu.algos.base import HubbardProblem
from qsfh_tpu.engine.expectation import Observable
from qsfh_tpu.engine.gates import apply_pauli_string, generator_rotation, pauli_rotation
from qsfh_tpu.ops.pauli import qubit_operator
from qsfh_tpu.parallel.mesh import amplitude_mesh
from qsfh_tpu.parallel.shmap_engine import ShardedPauliEngine, sharded_expectation

N = 10  # 1024 amplitudes over 8 devices -> 128 local


@pytest.fixture(scope="module")
def mesh():
    return amplitude_mesh(8)


@pytest.fixture(scope="module")
def engine(mesh):
    return ShardedPauliEngine(N, mesh)


@pytest.fixture(scope="module")
def psi():
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (1 << N,), dtype=jnp.float64) + 1j * jax.random.normal(
        jax.random.PRNGKey(1), (1 << N,), dtype=jnp.float64
    )
    return (v / jnp.linalg.norm(v)).astype(jnp.complex128)


def _shard(psi, engine):
    return jax.device_put(psi, engine.shard_spec())


CASES = [
    ("local X", 1 << 9, 0),               # qubit 9 -> lowest flat bit (local)
    ("cross X", 1 << 0, 0),               # qubit 0 -> top flat bit (sharded)
    ("cross Y", 1 << 1, 1 << 1),          # sharded qubit, Y
    ("mixed XZ", (1 << 0) | (1 << 8), (1 << 4) | (1 << 2)),
    ("Z only hi+lo", 0, (1 << 0) | (1 << 9)),
    ("wide string", (1 << 0) | (1 << 2) | (1 << 9), (1 << 1) | (1 << 5)),
]


class TestApplyPauli:
    @pytest.mark.parametrize("name,x,z", CASES)
    def test_matches_single_shard(self, engine, psi, name, x, z):
        expected = np.asarray(apply_pauli_string(psi, N, x, z))
        fn = jax.jit(
            engine.wrap(lambda p: engine.apply_pauli_local(p, x, z), out_replicated=False)
        )
        got = np.asarray(fn(_shard(psi, engine)))
        np.testing.assert_allclose(got, expected, atol=1e-12, err_msg=name)


class TestRotation:
    @pytest.mark.parametrize("name,x,z", CASES)
    def test_rotation_matches(self, engine, psi, name, x, z):
        theta = 0.37
        expected = np.asarray(pauli_rotation(psi, N, x, z, theta))
        fn = jax.jit(
            engine.wrap(
                lambda p: engine.pauli_rotation_local(p, x, z, theta), out_replicated=False
            )
        )
        got = np.asarray(fn(_shard(psi, engine)))
        np.testing.assert_allclose(got, expected, atol=1e-12, err_msg=name)

    def test_generator_rotation_matches(self, engine, psi):
        rot = [((1 << 0) | (1 << 3), (1 << 2), 0.5), (0, (1 << 0) | (1 << 9), -0.25)]
        theta = 0.8
        expected = np.asarray(generator_rotation(psi, N, rot, theta))
        fn = jax.jit(
            engine.wrap(
                lambda p: engine.generator_rotation_local(p, rot, theta),
                out_replicated=False,
            )
        )
        got = np.asarray(fn(_shard(psi, engine)))
        np.testing.assert_allclose(got, expected, atol=1e-12)


class TestExpectation:
    def test_small_operator(self, engine, psi):
        op = (
            qubit_operator("Z0 Z3", 0.5)
            + qubit_operator("X0 X1", 0.25)
            + qubit_operator("Y0 Y9", -0.4)
            + qubit_operator("X2", 0.3)
        )
        expected = float(Observable(op, N).expectation(psi))
        fn = sharded_expectation(engine, op)
        got = float(fn(_shard(psi, engine)))
        np.testing.assert_allclose(got, expected, atol=1e-11)

    def test_hubbard_hamiltonian(self, mesh):
        """Full 2x3 Hubbard H over the sharded engine matches single-shard."""
        p = HubbardProblem(2, 3, 1.0, 6.0, 6, 3, 3)
        n = p.n_qubits
        eng = ShardedPauliEngine(n, mesh)
        key = jax.random.PRNGKey(7)
        psi = jax.random.normal(key, (1 << n,), dtype=jnp.float64) + 1j * jax.random.normal(
            jax.random.PRNGKey(8), (1 << n,), dtype=jnp.float64
        )
        psi = (psi / jnp.linalg.norm(psi)).astype(jnp.complex128)
        expected = float(p.observables["H"].expectation(psi))
        fn = sharded_expectation(eng, p.qubit_hamiltonian)
        got = float(fn(jax.device_put(psi, eng.shard_spec())))
        np.testing.assert_allclose(got, expected, atol=1e-10)


class TestTwoQubit:
    @pytest.mark.parametrize(
        "qa,qb",
        [
            (8, 9),   # both local
            (0, 9),   # sharded + local
            (9, 0),   # swapped order
            (0, 1),   # both sharded
            (2, 5),   # sharded + mid
        ],
    )
    def test_matches_single_shard(self, engine, psi, qa, qb):
        from qsfh_tpu.engine.gates import apply_two_qubit, givens_plan_matrix

        M = givens_plan_matrix(0.61, -0.47)
        expected = np.asarray(apply_two_qubit(psi, N, M, qa, qb))
        fn = jax.jit(
            engine.wrap(
                lambda p: engine.apply_two_qubit_local(p, M, qa, qb), out_replicated=False
            )
        )
        got = np.asarray(fn(_shard(psi, engine)))
        np.testing.assert_allclose(got, expected, atol=1e-12)

    def test_random_unitary(self, engine, psi):
        from qsfh_tpu.engine.gates import apply_two_qubit

        rng = np.random.default_rng(5)
        A = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
        Q, _ = np.linalg.qr(A)
        expected = np.asarray(apply_two_qubit(psi, N, Q, 1, 7))
        fn = jax.jit(
            engine.wrap(
                lambda p: engine.apply_two_qubit_local(p, Q, 1, 7), out_replicated=False
            )
        )
        got = np.asarray(fn(_shard(psi, engine)))
        np.testing.assert_allclose(got, expected, atol=1e-12)
