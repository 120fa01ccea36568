"""Scan-compiled circuit engine vs the unrolled engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsfh_tpu.algos.base import HubbardProblem
from qsfh_tpu.engine.compiled import CompiledCircuit, xor_flip_traced
from qsfh_tpu.engine.gates import _xor_flip, generator_rotation
from qsfh_tpu.engine.state import basis_state
from qsfh_tpu.grad.adjoint import adjoint_apply, givens_network_ops
from qsfh_tpu.ops.jw import jordan_wigner
from qsfh_tpu.ops.pool import hubbard_interaction_pool_simplified


@pytest.fixture(scope="module")
def setup():
    p = HubbardProblem(2, 2, 1.0, 6.0, 4, 2, 2)
    pool = hubbard_interaction_pool_simplified(2, 2)[:5]
    rot = [jordan_wigner(g).rotation_terms() for g in pool]
    ops = [("rot", tuple(r), k) for k, r in enumerate(rot)]
    ops += givens_network_ops(p.n_qubits, p.diagonal, p.decomposition)
    psi0 = basis_state(p.n_qubits, p.spin_up_indices + p.spin_down_indices)
    return p, rot, ops, psi0


class TestXorFlipTraced:
    @pytest.mark.parametrize("mask", [0, 1, 0b1010, 0xFF, 0b10110011])
    def test_matches_static(self, mask):
        n = 8
        psi = jnp.arange(1 << n).astype(jnp.complex128)
        expected = np.asarray(_xor_flip(psi, n, mask))
        got = np.asarray(jax.jit(lambda p, m: xor_flip_traced(p, n, m))(psi, jnp.uint32(mask)))
        np.testing.assert_allclose(got, expected)


class TestCompiledCircuit:
    def test_forward_matches_unrolled(self, setup):
        p, rot, ops, psi0 = setup
        cc = CompiledCircuit(ops, p.n_qubits)
        thetas = jnp.asarray([0.3, -0.2, 0.15, 0.4, -0.1], dtype=jnp.float64)
        got = np.asarray(jax.jit(cc.apply)(psi0, thetas))
        expected = np.asarray(adjoint_apply(p.n_qubits, tuple(ops), psi0, thetas))
        np.testing.assert_allclose(got, expected, atol=1e-12)

    def test_inverse_roundtrip(self, setup):
        p, rot, ops, psi0 = setup
        cc = CompiledCircuit(ops, p.n_qubits)
        thetas = jnp.asarray([0.3, -0.2, 0.15, 0.4, -0.1], dtype=jnp.float64)
        psi = cc.apply(psi0, thetas)
        back = cc.apply_inverse(psi, thetas)
        np.testing.assert_allclose(np.asarray(back), np.asarray(psi0), atol=1e-12)

    def test_energy_and_grad_match(self, setup):
        p, rot, ops, psi0 = setup
        cc = CompiledCircuit(ops, p.n_qubits)
        obs = p.observables["H"]
        thetas = jnp.asarray([0.3, -0.2, 0.15, 0.4, -0.1], dtype=jnp.float64)

        def loss_cc(th):
            return obs.expectation(cc.apply(psi0, th))

        def loss_ref(th):
            psi = psi0
            for k, r in enumerate(rot):
                psi = generator_rotation(psi, p.n_qubits, r, th[k])
            from qsfh_tpu.engine.circuits import apply_givens_network

            psi = apply_givens_network(psi, p.n_qubits, p.diagonal, p.decomposition)
            return obs.expectation(psi)

        np.testing.assert_allclose(float(loss_cc(thetas)), float(loss_ref(thetas)), atol=1e-11)
        g1 = np.asarray(jax.jit(jax.grad(loss_cc))(thetas))
        g2 = np.asarray(jax.grad(loss_ref)(thetas))
        np.testing.assert_allclose(g1, g2, atol=1e-9)

    def test_diag_segment(self):
        """HVA-style traced diagonal rotation segment."""
        p = HubbardProblem(2, 2, 1.0, 6.0, 4, 2, 2)
        D = np.asarray(p.coulomb_diagonal(dtype=jnp.float64))
        ops = [("diag", D, 0)]
        cc = CompiledCircuit(ops, p.n_qubits)
        psi0 = basis_state(p.n_qubits, [0, 1, 2, 3])
        thetas = jnp.asarray([0.41])
        got = np.asarray(cc.apply(psi0, thetas))
        from qsfh_tpu.engine.gates import diagonal_rotation

        expected = np.asarray(diagonal_rotation(psi0, jnp.asarray(D), 0.41))
        np.testing.assert_allclose(got, expected, atol=1e-12)

    def test_compile_size_constant_in_depth(self, setup):
        """The jaxpr must not grow with ansatz depth (the whole point)."""
        p, rot, ops, psi0 = setup
        short = CompiledCircuit(
            [("rot", tuple(rot[0]), 0)] + givens_network_ops(p.n_qubits, p.diagonal, p.decomposition),
            p.n_qubits,
        )
        long_ops = [("rot", tuple(rot[k % len(rot)]), k) for k in range(40)]
        long = CompiledCircuit(
            long_ops + givens_network_ops(p.n_qubits, p.diagonal, p.decomposition),
            p.n_qubits,
        )
        th_s = jnp.zeros(1)
        th_l = jnp.zeros(40)
        n_short = len(jax.make_jaxpr(short.apply)(psi0, th_s).jaxpr.eqns)
        n_long = len(jax.make_jaxpr(long.apply)(psi0, th_l).jaxpr.eqns)
        assert n_long <= n_short + 5  # same segments, just longer arrays


class TestGroupedRotations:
    """Commuting same-flip runs fuse into ONE closed-form pair rotation
    (engine/compiled.py _group_rot_terms/_grot_body) -- exactly, since
    the Trotter product of commuting terms IS exp(-i theta sum)."""

    def test_grouping_fires_on_pool_generators(self, setup):
        from qsfh_tpu.engine.compiled import _group_rot_terms

        p, rot, ops, psi0 = setup
        cc = CompiledCircuit(ops, p.n_qubits)
        d = cc.segments[0].data
        grp = _group_rot_terms(d["xb"], d["zb"], d["scale"], d["pidx"],
                               d["phre"], d["phim"])
        assert grp is not None
        # every pool generator's JW strings share one flip mask: groups
        # must be several-fold fewer than terms
        assert grp["n_groups"] * 2 <= len(d["xb"])

    def test_grouped_matches_per_term(self, setup, monkeypatch):
        p, rot, ops, psi0 = setup
        cc = CompiledCircuit(ops, p.n_qubits)
        th = jnp.asarray(np.linspace(-0.3, 0.4, 5))

        monkeypatch.setenv("QSFH_GROUP_ROT", "0")
        ref = np.asarray(jax.jit(cc.apply)(psi0, th))
        monkeypatch.setenv("QSFH_GROUP_ROT", "1")
        got = np.asarray(jax.jit(cc.apply)(psi0, th))
        np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-13)

    def test_grouped_fwd_autodiff_matches(self, setup, monkeypatch):
        """jax.grad through the grouped forward equals the per-term one
        (guards the where/sinc form against the NaN-grad trap)."""
        p, rot, ops, psi0 = setup
        cc = CompiledCircuit(ops, p.n_qubits)
        th = jnp.asarray(np.linspace(-0.2, 0.5, 5))
        rng = np.random.default_rng(5)
        w = jnp.asarray(rng.normal(0, 1, psi0.shape[0]) + 0.3)

        def loss(t):
            psi = cc.apply(psi0, t)
            return jnp.real(jnp.vdot(psi, w * psi))

        monkeypatch.setenv("QSFH_GROUP_ROT", "0")
        g_ref = np.asarray(jax.grad(loss)(th))
        monkeypatch.setenv("QSFH_GROUP_ROT", "1")
        g_grp = np.asarray(jax.grad(loss)(th))
        assert np.linalg.norm(g_ref) > 1e-3  # non-degenerate probe
        np.testing.assert_allclose(g_grp, g_ref, rtol=1e-9, atol=1e-12)

    def test_grouped_adjoint_matches_per_term(self, setup, monkeypatch):
        """run_rot_adjoint with grouping reproduces the per-term sweep
        (same contract, same psi0/lam0/grads) on a generic cotangent."""
        from qsfh_tpu.engine.compiled import run_rot_adjoint

        p, rot, ops, psi0 = setup
        cc = CompiledCircuit(ops, p.n_qubits)
        seg = cc.segments[0]
        th = jnp.asarray(np.linspace(-0.2, 0.5, 5))
        rng = np.random.default_rng(5)
        w = jnp.asarray(rng.normal(0, 1, psi0.shape[0]) + 0.3)
        psi_f = cc.apply(psi0, th)
        lam = 2.0 * w * psi_f

        monkeypatch.setenv("QSFH_GROUP_ROT", "1")
        p_g, l_g, g_grp = run_rot_adjoint(seg, psi_f, lam, th, p.n_qubits)
        monkeypatch.setenv("QSFH_GROUP_ROT", "0")
        p_r, l_r, g_ref = run_rot_adjoint(seg, psi_f, lam, th, p.n_qubits)
        assert np.linalg.norm(np.asarray(g_ref)) > 1e-3
        np.testing.assert_allclose(np.asarray(g_grp), np.asarray(g_ref),
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(p_g), np.asarray(p_r),
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(l_g), np.asarray(l_r),
                                   rtol=1e-9, atol=1e-11)
