"""Pallas kernel correctness (interpret mode on CPU; real lowering on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsfh_tpu.engine.compiled import xor_flip_traced
from qsfh_tpu.engine.gates import pauli_rotation
from qsfh_tpu.engine.pallas_kernels import (
    HAVE_PALLAS,
    pauli_rotation_pallas,
    xor_gather_pallas,
)

pytestmark = pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")

N = 10


@pytest.fixture(scope="module")
def psi():
    k1, k2 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)
    v = jax.random.normal(k1, (1 << N,)) + 1j * jax.random.normal(k2, (1 << N,))
    return (v / jnp.linalg.norm(v)).astype(jnp.complex64)


class TestXorGather:
    @pytest.mark.parametrize(
        "mask", [0, 1, 0b101, 127, 128, 0b1010000000, 0b1111111111, 0b1000000001]
    )
    def test_matches_xla(self, psi, mask):
        expected = np.asarray(xor_flip_traced(psi, N, jnp.uint32(mask)))
        got = np.asarray(xor_gather_pallas(psi, N, jnp.uint32(mask)))
        np.testing.assert_allclose(got, expected, atol=1e-6)


class TestPauliRotationKernel:
    @pytest.mark.parametrize(
        "x,z",
        [
            (0b11, 0),          # XX on lane bits
            (0b11, 0b01),       # XY-like
            (1 << 9, 1 << 9),   # Y on a row bit (qubit 0)
            ((1 << 9) | 3, (1 << 4) | 1),
            (0, 0b1001),        # diagonal
        ],
    )
    def test_matches_engine(self, psi, x, z):
        theta = 0.37
        # engine reference (qubit-indexed masks)
        expected = np.asarray(pauli_rotation(psi, N, x, z, theta))
        # kernel takes FLAT masks + string phase, matching the compiled path
        from qsfh_tpu.engine.state import qmask_to_bmask

        xb = qmask_to_bmask(x, N)
        zb = qmask_to_bmask(z, N)
        ph = (-1j) ** (bin(x & z).count("1") % 4)
        got = np.asarray(
            pauli_rotation_pallas(
                psi, N, jnp.uint32(xb), jnp.uint32(zb), theta, ph.real, ph.imag
            )
        )
        np.testing.assert_allclose(got, expected, atol=1e-6)


class TestPallasScanIntegration:
    def test_rot_scan_with_pallas_body(self, psi, monkeypatch):
        """QSFH_PALLAS=1 routes the rot-scan body through the fused kernel;
        results must match the pure-XLA lowering."""
        import os

        import jax.numpy as jnp

        from qsfh_tpu.engine.compiled import CompiledCircuit

        ops = [
            ("rot", ((0b11, 0b01, 0.5), ((1 << 9) | 3, (1 << 4), -0.25)), 0),
            ("rot", ((1 << 9, 1 << 9, 1.0),), 1),
        ]
        psi32 = psi.astype(jnp.complex64)
        th = jnp.asarray([0.3, -0.7], jnp.float32)
        cc = CompiledCircuit(ops, N)
        expected = np.asarray(cc.apply(psi32, th))
        monkeypatch.setenv("QSFH_PALLAS", "1")
        cc2 = CompiledCircuit(ops, N)
        got = np.asarray(jax.jit(cc2.apply)(psi32, th))
        np.testing.assert_allclose(got, expected, atol=1e-6)


class TestObservableChainKernels:
    def test_expectation_and_apply_chain_match_xla(self, psi, monkeypatch):
        """QSFH_PALLAS=1 routes Observable.expectation_scan/apply_scan
        through the VMEM-resident chain kernels; results must match the
        pure-XLA scan lowering."""
        from qsfh_tpu.algos.base import HubbardProblem
        from qsfh_tpu.engine.expectation import Observable

        p = HubbardProblem(1, 5, 1.0, 6.0, 5, 3, 2)  # 10 qubits
        monkeypatch.delenv("QSFH_PALLAS", raising=False)
        obs = Observable(p.qubit_hamiltonian, p.n_qubits)
        e_xla = float(obs.expectation_scan(psi))
        w_xla = np.asarray(obs.apply_scan(psi))
        monkeypatch.setenv("QSFH_PALLAS", "1")
        obs2 = Observable(p.qubit_hamiltonian, p.n_qubits)
        e_pl = float(jax.jit(obs2.expectation_scan)(psi))
        w_pl = np.asarray(jax.jit(obs2.apply_scan)(psi))
        np.testing.assert_allclose(e_pl, e_xla, atol=2e-5)
        np.testing.assert_allclose(w_pl, w_xla, atol=2e-5)


class TestAdjointChainKernel:
    def test_adjoint_stage_matches_xla_on_same_inputs(self, monkeypatch, tmp_path):
        """The adjoint chain kernel produces the same per-parameter
        gradients as the XLA reverse scan, given identical (psi, lam)
        stage inputs.  (Comparing Adam-updated thetas instead would
        amplify roundoff on near-zero gradient components.)"""
        import optax
        from qsfh_tpu.algos.adapt import ADAPT

        kw = dict(
            n_epoch=0, threshold1=1e-2, threshold2=1e-2,
            x_dimension=1, y_dimension=5, n_electrons=5, n_spin_up=3,
            n_spin_down=2, tunneling=1.0, coulomb=6.0,
            ground_truth=False, plot=False, log_metrics=False,
            circuit_mode="split", dtype=jnp.complex64,
        )
        idx = (0, 1, 2)
        th = jnp.asarray([0.2, -0.3, 0.1], jnp.float32)
        opt = optax.adam(1e-2)
        monkeypatch.delenv("QSFH_PALLAS", raising=False)
        a = ADAPT(**kw, results_root=str(tmp_path / "x"))
        raw_x = a._build_step(idx, opt).raw_stages
        psi_r = jax.jit(raw_x["fwd"])(th)
        lam_r = jax.jit(raw_x["cotangent"])(psi_r)
        g_x = np.asarray(jax.jit(raw_x["adjoint"])(psi_r, lam_r, th))
        e_x = float(jax.jit(raw_x["energy"])(psi_r))

        monkeypatch.setenv("QSFH_PALLAS", "1")
        b = ADAPT(**kw, results_root=str(tmp_path / "p"))
        raw_p = b._build_step(idx, opt).raw_stages
        psi_p = jax.jit(raw_p["fwd"])(th)
        lam_p = jax.jit(raw_p["cotangent"])(psi_p)
        e_p = float(jax.jit(raw_p["energy"])(psi_p))
        # pallas adjoint on the XLA-produced inputs: isolates the kernel
        g_p = np.asarray(jax.jit(raw_p["adjoint"])(psi_r, lam_r, th))

        np.testing.assert_allclose(np.asarray(psi_p), np.asarray(psi_r), atol=2e-6)
        np.testing.assert_allclose(e_p, e_x, atol=2e-5)
        np.testing.assert_allclose(g_p, g_x, atol=2e-5)


class TestScreenChainKernel:
    def test_screen_scan_matches_xla(self, psi, monkeypatch):
        """QSFH_PALLAS=1 routes PackedPool.screen_scan through the chain
        kernel; per-generator gradients must match the XLA scan."""
        from qsfh_tpu.algos.base import HubbardProblem
        from qsfh_tpu.engine.expectation import Observable, PackedPool
        from qsfh_tpu.ops.jw import jordan_wigner
        from qsfh_tpu.ops.pool import hubbard_interaction_pool_simplified

        p = HubbardProblem(1, 5, 1.0, 6.0, 5, 3, 2)  # 10 qubits
        gens = [
            0.5 * jordan_wigner(g)
            for g in hubbard_interaction_pool_simplified(1, 5)[:6]
        ]
        obs = Observable(p.qubit_hamiltonian, p.n_qubits)
        w = obs.apply(psi)
        monkeypatch.delenv("QSFH_PALLAS", raising=False)
        pool = PackedPool(gens, p.n_qubits)
        g_xla = np.asarray(pool.screen_scan(psi, w))
        monkeypatch.setenv("QSFH_PALLAS", "1")
        pool2 = PackedPool(gens, p.n_qubits)
        g_pl = np.asarray(jax.jit(pool2.screen_scan)(psi, w))
        np.testing.assert_allclose(g_pl, g_xla, atol=3e-5)


class TestTopBitsBranch:
    def test_xor_gather_top_row_bits_n15(self):
        """rows > 128 engages the third (top-bits) XOR matmul in
        _xor_permute; cover it in interpret mode with a mask spanning
        lane, mid and top row bits."""
        n = 15
        k1, k2 = jax.random.PRNGKey(3), jax.random.PRNGKey(4)
        v = jax.random.normal(k1, (1 << n,)) + 1j * jax.random.normal(k2, (1 << n,))
        psi15 = (v / jnp.linalg.norm(v)).astype(jnp.complex64)
        mask = (1 << 14) | (1 << 9) | 0b101  # top row bit | mid row bit | lanes
        expected = np.asarray(xor_flip_traced(psi15, n, jnp.uint32(mask)))
        got = np.asarray(xor_gather_pallas(psi15, n, jnp.uint32(mask)))
        np.testing.assert_allclose(got, expected, atol=1e-6)


class TestStreamingKernels:
    """HBM-streaming grouped kernels (n beyond the VMEM chain cap).

    Forced small stream blocks (8 rows) at n=12 so the grid/grouping
    machinery (block-crossing flips, per-block z-parity sign, grid
    accumulation) is exercised in interpret mode: 32 rows -> 4 blocks,
    2 block-crossing flip bits."""

    def _h12(self):
        from qsfh_tpu.algos.base import HubbardProblem
        from qsfh_tpu.engine.expectation import Observable

        p = HubbardProblem(2, 3, 1.0, 6.0, 6, 3, 3)  # 12 qubits
        return Observable(p.qubit_hamiltonian, p.n_qubits)

    @pytest.fixture()
    def psi12(self):
        k1, k2 = jax.random.PRNGKey(5), jax.random.PRNGKey(6)
        v = jax.random.normal(k1, (1 << 12,)) + 1j * jax.random.normal(
            k2, (1 << 12,)
        )
        return (v / jnp.linalg.norm(v)).astype(jnp.complex64)

    def test_expectation_stream_matches_xla(self, psi12, monkeypatch):
        from qsfh_tpu.engine.pallas_kernels import expectation_stream_pallas

        obs = self._h12()
        monkeypatch.delenv("QSFH_PALLAS", raising=False)
        e_xla = float(obs.expectation_scan(psi12))
        xs, zs, cre, cim = obs._scan_terms()
        monkeypatch.setenv("QSFH_PALLAS_STREAM_ROWS", "8")
        e_st = float(
            expectation_stream_pallas(
                psi12, 12, xs, zs,
                cre.astype(np.float32), cim.astype(np.float32),
            )
        )
        np.testing.assert_allclose(e_st, e_xla, atol=2e-5)

    def test_apply_stream_matches_xla(self, psi12, monkeypatch):
        from qsfh_tpu.engine.pallas_kernels import apply_stream_pallas

        obs = self._h12()
        monkeypatch.delenv("QSFH_PALLAS", raising=False)
        w_xla = np.asarray(obs.apply_scan(psi12))
        xs, zs, cre, cim = obs._scan_terms()
        monkeypatch.setenv("QSFH_PALLAS_STREAM_ROWS", "8")
        w_st = np.asarray(
            apply_stream_pallas(
                psi12, 12, xs, zs,
                cre.astype(np.float32), cim.astype(np.float32),
            )
        )
        np.testing.assert_allclose(w_st, w_xla, atol=2e-5)

    def test_screen_stream_matches_xla(self, psi12, monkeypatch):
        from qsfh_tpu.algos.base import HubbardProblem
        from qsfh_tpu.engine.expectation import Observable, PackedPool
        from qsfh_tpu.ops.jw import jordan_wigner
        from qsfh_tpu.ops.pool import hubbard_interaction_pool_simplified

        p = HubbardProblem(2, 3, 1.0, 6.0, 6, 3, 3)
        gens = [
            jordan_wigner(g)
            for g in hubbard_interaction_pool_simplified(2, 3)[:8]
        ]
        obs = Observable(p.qubit_hamiltonian, p.n_qubits)
        w = obs.apply(psi12)
        monkeypatch.delenv("QSFH_PALLAS", raising=False)
        pool = PackedPool(gens, p.n_qubits)
        g_xla = np.asarray(pool.screen_scan(psi12, w))
        monkeypatch.setenv("QSFH_PALLAS", "1")
        monkeypatch.setenv("QSFH_PALLAS_MAX_N", "11")
        monkeypatch.setenv("QSFH_PALLAS_STREAM_ROWS", "8")
        pool2 = PackedPool(gens, p.n_qubits)
        g_st = np.asarray(jax.jit(pool2.screen_scan)(psi12, w))
        np.testing.assert_allclose(g_st, g_xla, atol=3e-5)

    @pytest.mark.slow
    def test_adjoint_stream_matches_xla(self, monkeypatch, tmp_path):
        """Full split-stage pipeline at 12q routed through the streaming
        kernels (fwd rotations, cotangent apply, adjoint sweep): gradients
        must match the XLA reverse scan on identical stage inputs."""
        import optax

        from qsfh_tpu.algos.adapt import ADAPT

        kw = dict(
            n_epoch=0, threshold1=1e-2, threshold2=1e-2,
            x_dimension=2, y_dimension=3, n_electrons=6, n_spin_up=3,
            n_spin_down=3, tunneling=1.0, coulomb=6.0,
            ground_truth=False, plot=False, log_metrics=False,
            circuit_mode="split", dtype=jnp.complex64,
        )
        idx = (0, 1, 2)
        th = jnp.asarray([0.2, -0.3, 0.1], jnp.float32)
        opt = optax.adam(1e-2)
        monkeypatch.setenv("QSFH_PALLAS", "0")
        a = ADAPT(**kw, results_root=str(tmp_path / "x"))
        raw_x = a._build_step(idx, opt).raw_stages
        psi_r = jax.jit(raw_x["fwd"])(th)
        lam_r = jax.jit(raw_x["cotangent"])(psi_r)
        g_x = np.asarray(jax.jit(raw_x["adjoint"])(psi_r, lam_r, th))

        monkeypatch.setenv("QSFH_PALLAS", "1")
        monkeypatch.setenv("QSFH_PALLAS_MAX_N", "11")  # force past the chain
        monkeypatch.setenv("QSFH_PALLAS_STREAM_ROWS", "16")
        b = ADAPT(**kw, results_root=str(tmp_path / "p"))
        raw_p = b._build_step(idx, opt).raw_stages
        psi_p = jax.jit(raw_p["fwd"])(th)
        g_p = np.asarray(jax.jit(raw_p["adjoint"])(psi_r, lam_r, th))
        np.testing.assert_allclose(np.asarray(psi_p), np.asarray(psi_r), atol=2e-6)
        np.testing.assert_allclose(g_p, g_x, atol=2e-5)

    @pytest.mark.slow
    def test_mixed_chain_fwd_stream_adjoint(self, monkeypatch, tmp_path):
        """Mixed-cap split in miniature: fwd/energy/cotangent take the VMEM
        chain kernels while the ADJOINT streams (its cap QSFH_PALLAS_ADJ_MAX_N
        forced one below here).  Since round 4 the production adjoint chain
        also covers 18q (separable sign planes, benchmarks/tpu_adj18.json),
        but the mixed route stays reachable via the env override and its
        gradients must match the pure-XLA reverse scan."""
        import optax

        from qsfh_tpu.algos.adapt import ADAPT

        kw = dict(
            n_epoch=0, threshold1=1e-2, threshold2=1e-2,
            x_dimension=2, y_dimension=3, n_electrons=6, n_spin_up=3,
            n_spin_down=3, tunneling=1.0, coulomb=6.0,
            ground_truth=False, plot=False, log_metrics=False,
            circuit_mode="split", dtype=jnp.complex64,
        )
        idx = (0, 1, 2)
        th = jnp.asarray([0.2, -0.3, 0.1], jnp.float32)
        opt = optax.adam(1e-2)
        monkeypatch.setenv("QSFH_PALLAS", "0")
        a = ADAPT(**kw, results_root=str(tmp_path / "x"))
        raw_x = a._build_step(idx, opt).raw_stages
        psi_r = jax.jit(raw_x["fwd"])(th)
        lam_r = jax.jit(raw_x["cotangent"])(psi_r)
        g_x = np.asarray(jax.jit(raw_x["adjoint"])(psi_r, lam_r, th))

        monkeypatch.setenv("QSFH_PALLAS", "1")
        monkeypatch.setenv("QSFH_PALLAS_MAX_N", "12")   # chain covers 12q...
        monkeypatch.setenv("QSFH_PALLAS_ADJ_MAX_N", "11")  # ...adjoint doesn't
        monkeypatch.setenv("QSFH_PALLAS_STREAM_ROWS", "16")
        b = ADAPT(**kw, results_root=str(tmp_path / "p"))
        raw_p = b._build_step(idx, opt).raw_stages
        psi_p = jax.jit(raw_p["fwd"])(th)
        e_p = float(jax.jit(raw_p["energy"])(psi_p))
        e_x = float(jax.jit(raw_x["energy"])(psi_r))
        g_p = np.asarray(jax.jit(raw_p["adjoint"])(psi_r, lam_r, th))
        np.testing.assert_allclose(np.asarray(psi_p), np.asarray(psi_r), atol=2e-6)
        np.testing.assert_allclose(e_p, e_x, atol=2e-6)
        np.testing.assert_allclose(g_p, g_x, atol=2e-5)

    def test_rotation_stream_matches_xla(self, psi12, monkeypatch):
        """Streaming rotations at n=12 with 8-row blocks: local runs
        (flips below bit 10), cross-block rotations (flips on bits 10/11),
        and z-masks reaching the block-index bits."""
        from qsfh_tpu.engine.compiled import CompiledCircuit

        ops = [
            ("rot", ((0b11, 0b101, 0.5), (0b1100, 0b0110, -0.25)), 0),  # local
            ("rot", (((1 << 11) | 3, (1 << 10) | 1, 1.0),), 1),  # cross
            ("rot", ((1 << 5, (1 << 11) | (1 << 5), -0.5),), 2),  # local, hi-z
            ("rot", (((1 << 10), (1 << 3), 0.75),), 3),  # cross
        ]
        th = jnp.asarray([0.3, -0.7, 0.41, 0.9], jnp.float32)
        psi32 = psi12.astype(jnp.complex64)
        monkeypatch.setenv("QSFH_PALLAS", "0")
        out_xla = np.asarray(CompiledCircuit(ops, 12).apply(psi32, th))
        monkeypatch.setenv("QSFH_PALLAS", "1")
        monkeypatch.setenv("QSFH_PALLAS_MAX_N", "11")  # force past the chain
        monkeypatch.setenv("QSFH_PALLAS_STREAM_ROWS", "8")
        cc = CompiledCircuit(ops, 12)
        out_st = np.asarray(jax.jit(lambda p, t: cc.apply(p, t))(psi32, th))
        np.testing.assert_allclose(out_st, out_xla, atol=2e-6)
        # exact inverse must roundtrip through the same streaming route
        back = np.asarray(cc.apply_inverse(jnp.asarray(out_st), th))
        np.testing.assert_allclose(back, np.asarray(psi32), atol=5e-6)

    def test_observable_routes_to_stream_between_caps(self, psi12, monkeypatch):
        """chain_max < n <= stream_max routes expectation/apply through the
        streaming kernels (verified numerically vs the XLA scan)."""
        obs = self._h12()
        monkeypatch.delenv("QSFH_PALLAS", raising=False)
        e_xla = float(obs.expectation_scan(psi12))
        w_xla = np.asarray(obs.apply_scan(psi12))
        monkeypatch.setenv("QSFH_PALLAS", "1")
        monkeypatch.setenv("QSFH_PALLAS_MAX_N", "11")  # force past the chain
        monkeypatch.setenv("QSFH_PALLAS_STREAM_ROWS", "8")
        obs2 = self._h12()
        e_st = float(jax.jit(obs2.expectation_scan)(psi12))
        w_st = np.asarray(jax.jit(obs2.apply_scan)(psi12))
        np.testing.assert_allclose(e_st, e_xla, atol=2e-5)
        np.testing.assert_allclose(w_st, w_xla, atol=2e-5)


class TestChainInverse:
    def test_apply_inverse_roundtrip_with_pallas(self, psi, monkeypatch):
        """direction=-1 routes through the chain kernel with reversed,
        negated terms; apply_inverse(apply(psi)) must return psi."""
        from qsfh_tpu.engine.compiled import CompiledCircuit

        ops = [
            ("rot", ((0b11, 0b01, 0.5), ((1 << 9) | 3, (1 << 4), -0.25)), 0),
            ("rot", ((1 << 9, 1 << 9, 1.0),), 1),
        ]
        monkeypatch.setenv("QSFH_PALLAS", "1")
        cc = CompiledCircuit(ops, N)
        th = jnp.asarray([0.3, -0.7], jnp.float32)
        psi32 = psi.astype(jnp.complex64)
        out = jax.jit(lambda p: cc.apply_inverse(cc.apply(p, th), th))(psi32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(psi32), atol=2e-6)


class TestRoutingAndEdgeGuards:
    """Round-2 session-7 review fixes: lowered-cap routing floors, the
    xor_gather dtype contract, and empty-term chain calls."""

    def test_lowered_cap_10q_falls_back_to_xla(self, monkeypatch):
        """QSFH_PALLAS_MAX_N=9 with a 10-qubit circuit must use the XLA
        scan (the streaming kernels raise below 11 qubits), not crash."""
        import jax

        from qsfh_tpu.algos.base import HubbardProblem
        from qsfh_tpu.engine.compiled import CompiledCircuit
        from qsfh_tpu.engine.state import basis_state
        from qsfh_tpu.ops.jw import jordan_wigner
        from qsfh_tpu.ops.pool import hubbard_interaction_pool_simplified

        p = HubbardProblem(1, 5, 1.0, 4.0, 5, 3, 2)
        g = jordan_wigner(hubbard_interaction_pool_simplified(1, 5)[0])
        prog = [("rot", g.rotation_terms(), 0)]
        psi0 = basis_state(10, (0, 2, 4, 1, 3), dtype=jnp.complex64)

        monkeypatch.delenv("QSFH_PALLAS", raising=False)
        ref = np.asarray(
            CompiledCircuit(prog, 10).apply(psi0, jnp.asarray([0.3], jnp.float32))
        )
        monkeypatch.setenv("QSFH_PALLAS", "1")
        monkeypatch.setenv("QSFH_PALLAS_MAX_N", "9")
        got = np.asarray(
            CompiledCircuit(prog, 10).apply(psi0, jnp.asarray([0.3], jnp.float32))
        )
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_xor_gather_rejects_complex128(self):
        psi = jnp.zeros(1 << 10, jnp.complex128).at[0].set(1.0)
        with pytest.raises(ValueError, match="complex64"):
            xor_gather_pallas(psi, 10, jnp.uint32(3))

    def test_empty_term_chains_return_empty(self):
        from qsfh_tpu.engine.pallas_kernels import (
            adjoint_chain_pallas,
            screen_chain_pallas,
        )

        psi = jnp.zeros(1 << 10, jnp.complex64).at[0].set(1.0)
        empty_u = np.zeros(0, np.uint32)
        empty_f = np.zeros(0, np.float32)
        contribs = screen_chain_pallas(
            psi, psi, 10, empty_u, empty_u, empty_f, empty_f
        )
        assert np.asarray(contribs).shape == (0,)
        p0, l0, c = adjoint_chain_pallas(
            psi, psi, 10, empty_u, empty_u, empty_f, empty_f, empty_f, empty_f
        )
        assert np.asarray(c).shape == (0,)
        np.testing.assert_allclose(np.asarray(p0), np.asarray(psi))


class TestStaticStreamEquivalence:
    """Static-mask streaming kernels == dynamic data-driven kernels.

    The static path (QSFH_STREAM_STATIC=1, the default) unrolls each flip
    group with host-known masks: identity permute pieces are skipped, the
    sublane XOR lowers to an (8,8) matmul + aligned slice/concat swaps,
    and per-term signs fold into coefficient-weighted planes.  Random
    masks here hit every decomposition zone (identity / lane-only /
    low-row / high-row / mixed); n=13 exercises the aligned concat swaps
    (rows=64, br=32 -> row bits 3-4)."""

    def _random_terms(self, n, T, seed):
        rng = np.random.default_rng(seed)
        N = 1 << n
        xs = rng.integers(0, N, T, dtype=np.uint32)
        zs = rng.integers(0, N, T, dtype=np.uint32)
        xs[0] = 0                      # diagonal term
        xs[1] = 0b101                  # lane-only flips
        xs[2] = 0b110000000            # low row bits only
        xs[3] = (N >> 1) | 0b1         # block-crossing + lane
        cre = rng.standard_normal(T).astype(np.float32)
        cim = rng.standard_normal(T).astype(np.float32)
        cim[::3] = 0.0
        return xs, zs, cre, cim

    # n=13 (~22 s interpret mode) exercises the odd-row-count geometry; the
    # n=12 leg carries the static-vs-dynamic contract in the fast profile
    @pytest.mark.parametrize(
        "n", [12, pytest.param(13, marks=pytest.mark.slow)]
    )
    def test_static_matches_dynamic(self, n, monkeypatch):
        from qsfh_tpu.engine.pallas_kernels import (
            apply_stream_pallas,
            expectation_stream_pallas,
            screen_stream_pallas,
        )

        k1, k2 = jax.random.PRNGKey(n), jax.random.PRNGKey(n + 100)
        v = jax.random.normal(k1, (1 << n,)) + 1j * jax.random.normal(
            k2, (1 << n,)
        )
        psi = (v / jnp.linalg.norm(v)).astype(jnp.complex64)
        w = jax.random.normal(k2, (1 << n,)).astype(jnp.complex64)
        xs, zs, cre, cim = self._random_terms(n, 16, seed=n)

        outs = {}
        for flag in ("1", "0"):
            monkeypatch.setenv("QSFH_STREAM_STATIC", flag)
            e = float(expectation_stream_pallas(psi, n, xs, zs, cre, cim))
            a = np.asarray(apply_stream_pallas(psi, n, xs, zs, cre, cim))
            s, perm = screen_stream_pallas(psi, w, n, xs, zs, cre, cim)
            sv = np.zeros(len(xs))
            sv[perm] = np.asarray(s)
            outs[flag] = (e, a, sv)
        np.testing.assert_allclose(outs["1"][0], outs["0"][0], atol=1e-5)
        np.testing.assert_allclose(outs["1"][1], outs["0"][1], atol=1e-5)
        np.testing.assert_allclose(outs["1"][2], outs["0"][2], atol=1e-4)

    def test_over_cap_groups_chunk_onto_static_kernel(self, monkeypatch):
        """Groups larger than QSFH_STREAM_STATIC_MAX_TERMS must SPLIT into
        cap-size static chunks, not fall to the dynamic kernel (the
        bimodal ~20x chunk costs of benchmarks/tpu_screen_24.log), and
        all four streaming entry points must agree with the uncapped
        route -- including the screen perm lockstep."""
        from qsfh_tpu.engine.pallas_kernels import (
            apply_stream_pallas,
            expectation_stream_fused_static,
            expectation_stream_pallas,
            screen_stream_pallas,
            screen_stream_perm,
        )

        n = 11
        rng = np.random.default_rng(3)
        # 24 terms over only TWO distinct flip masks -> both groups exceed
        # a cap of 8 and must chunk
        xs = np.repeat(np.array([5, 1 << (n - 1)], np.uint32), 12)
        zs = rng.integers(0, 1 << n, 24).astype(np.uint32)
        cre = rng.standard_normal(24).astype(np.float32)
        cim = np.zeros(24, np.float32)
        k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
        v = jax.random.normal(k1, (1 << n,)) + 1j * jax.random.normal(
            k2, (1 << n,)
        )
        psi = (v / jnp.linalg.norm(v)).astype(jnp.complex64)
        w = jax.random.normal(k2, (1 << n,)).astype(jnp.complex64)
        re = np.asarray(psi.real, np.float32).reshape(-1, 128)
        im = np.asarray(psi.imag, np.float32).reshape(-1, 128)

        monkeypatch.setenv("QSFH_STREAM_STATIC", "1")
        outs = {}
        for cap in ("1024", "8"):
            monkeypatch.setenv("QSFH_STREAM_STATIC_MAX_TERMS", cap)
            e = float(expectation_stream_pallas(psi, n, xs, zs, cre, cim))
            ef = float(expectation_stream_fused_static(
                jnp.asarray(re), jnp.asarray(im), n, xs, zs, cre, cim))
            a = np.asarray(apply_stream_pallas(psi, n, xs, zs, cre, cim))
            s, perm = screen_stream_pallas(psi, w, n, xs, zs, cre, cim)
            host_perm = screen_stream_perm(n, xs, zs, cre, cim)
            np.testing.assert_array_equal(host_perm, perm)
            sv = np.zeros(len(xs))
            sv[perm] = np.asarray(s)
            outs[cap] = (e, ef, a, sv)
        np.testing.assert_allclose(outs["8"][0], outs["1024"][0], atol=1e-5)
        np.testing.assert_allclose(outs["8"][1], outs["1024"][1], atol=1e-5)
        np.testing.assert_allclose(outs["8"][2], outs["1024"][2], atol=1e-5)
        np.testing.assert_allclose(outs["8"][3], outs["1024"][3], atol=1e-4)

    @pytest.mark.parametrize("flag", ["1", "0"])
    def test_screen_perm_helper_lockstep(self, flag, monkeypatch):
        """screen_stream_perm (host-only) must reproduce the permutation
        screen_stream_pallas returns, under both static and dynamic
        kernels -- external consumers (benchmarks/tpu_stream_big.py)
        map slots back through it without touching the device."""
        from qsfh_tpu.engine.pallas_kernels import (
            screen_stream_pallas,
            screen_stream_perm,
        )

        n = 12
        monkeypatch.setenv("QSFH_STREAM_STATIC", flag)
        k1, k2 = jax.random.PRNGKey(7), jax.random.PRNGKey(8)
        v = jax.random.normal(k1, (1 << n,)) + 1j * jax.random.normal(
            k2, (1 << n,)
        )
        psi = (v / jnp.linalg.norm(v)).astype(jnp.complex64)
        w = jax.random.normal(k2, (1 << n,)).astype(jnp.complex64)
        xs, zs, cre, cim = self._random_terms(n, 23, seed=5)
        _, perm = screen_stream_pallas(psi, w, n, xs, zs, cre, cim)
        host_perm = screen_stream_perm(n, xs, zs, cre, cim)
        np.testing.assert_array_equal(host_perm, perm)


class TestFusedStaticStream:
    """expectation_stream_fused_static == the per-group static path (same
    math, (1+G) state passes instead of 2G -- VERDICT r3 next #4)."""

    def _terms(self, n, T, seed):
        rng = np.random.default_rng(seed)
        xs = rng.integers(0, 1 << n, T).astype(np.uint32)
        zs = rng.integers(0, 1 << n, T).astype(np.uint32)
        xs[0] = 0                      # an xh == 0 group (conj-ref partners)
        xs[1] = 1 << (n - 1)           # a pure block-crossing group
        cre = rng.standard_normal(T).astype(np.float32)
        cim = rng.standard_normal(T).astype(np.float32)
        cim[::2] = 0.0
        return xs, zs, cre, cim

    @pytest.mark.parametrize("gcap", [2, 64])
    def test_matches_per_group_static(self, gcap, monkeypatch):
        from qsfh_tpu.engine.pallas_kernels import (
            expectation_stream_fused_static,
            expectation_stream_planes,
        )

        n = 12
        monkeypatch.setenv("QSFH_STREAM_FUSED_GROUPS", str(gcap))
        k1, k2 = jax.random.PRNGKey(3), jax.random.PRNGKey(4)
        rows = (1 << n) // 128
        re = jax.random.normal(k1, (rows, 128), jnp.float32)
        im = jax.random.normal(k2, (rows, 128), jnp.float32)
        xs, zs, cre, cim = self._terms(n, 24, seed=5)
        ref = float(expectation_stream_planes(re, im, n, xs, zs, cre, cim))
        got = float(expectation_stream_fused_static(re, im, n, xs, zs, cre, cim))
        assert got == pytest.approx(ref, abs=2e-4 * max(1.0, abs(ref)))

    def test_oversized_group_falls_back_dynamic(self, monkeypatch):
        from qsfh_tpu.engine.pallas_kernels import (
            expectation_stream_fused_static,
            expectation_stream_planes,
        )

        n = 12
        monkeypatch.setenv("QSFH_STREAM_STATIC_MAX_TERMS", "4")
        rng = np.random.default_rng(9)
        rows = (1 << n) // 128
        re = jnp.asarray(rng.standard_normal((rows, 128)), jnp.float32)
        im = jnp.asarray(rng.standard_normal((rows, 128)), jnp.float32)
        # 8 terms in ONE group (same x) -> exceeds the 4-term static cap
        xs = np.full(8, 3, np.uint32)
        zs = rng.integers(0, 1 << n, 8).astype(np.uint32)
        cre = rng.standard_normal(8).astype(np.float32)
        cim = np.zeros(8, np.float32)
        ref = float(expectation_stream_planes(re, im, n, xs, zs, cre, cim))
        got = float(expectation_stream_fused_static(re, im, n, xs, zs, cre, cim))
        assert got == pytest.approx(ref, abs=2e-4 * max(1.0, abs(ref)))


class TestStreamRoute:
    """The 30q fused-static 256-row working set crashes the tunneled TPU
    worker (kernel fault, benchmarks/tpu_stream_30.log); round 5 measured
    128-row blocks running clean at 565.6 ms (tpu_stream_big_30.json), so
    the default is fused-static through 30q with the halved block cap
    (see _stream_block_rows), per-group streaming above, and explicit env
    overrides still force any route for probes."""

    def test_defaults_by_size(self, monkeypatch):
        from qsfh_tpu.engine.expectation import stream_route

        monkeypatch.delenv("QSFH_STREAM_FUSED", raising=False)
        monkeypatch.delenv("QSFH_STREAM_FUSED_STATIC", raising=False)
        assert stream_route(26) == "fused_static"
        assert stream_route(28) == "fused_static"
        assert stream_route(30) == "fused_static"
        assert stream_route(32) == "grouped"

    def test_static_block_cap_halves_at_30q(self, monkeypatch):
        from qsfh_tpu.engine.pallas_kernels import _stream_block_rows

        monkeypatch.delenv("QSFH_PALLAS_STREAM_ROWS", raising=False)
        monkeypatch.setenv("QSFH_STREAM_FUSED_STATIC", "1")
        assert _stream_block_rows(1 << 21) == 256   # 28q
        assert _stream_block_rows(1 << 23) == 128   # 30q

    def test_env_overrides(self, monkeypatch):
        from qsfh_tpu.engine.expectation import stream_route

        monkeypatch.setenv("QSFH_STREAM_FUSED_STATIC", "1")
        assert stream_route(30) == "fused_static"
        monkeypatch.setenv("QSFH_STREAM_FUSED_STATIC", "0")
        assert stream_route(26) == "grouped"
        monkeypatch.setenv("QSFH_STREAM_FUSED", "1")
        assert stream_route(26) == "fused"
