"""Adjoint-gradient tests: must match backprop exactly.

Reference analog: the lightning.gpu adjoint path switch at
/root/reference/models/adapt_vqe.py:299-304.
"""

import jax
import jax.numpy as jnp
import numpy as np

from qsfh_tpu.algos.base import HubbardProblem
from qsfh_tpu.engine.circuits import apply_givens_network
from qsfh_tpu.engine.expectation import Observable
from qsfh_tpu.engine.gates import generator_rotation
from qsfh_tpu.engine.state import basis_state
from qsfh_tpu.grad import build_adjoint_energy, givens_network_ops
from qsfh_tpu.ops.jw import jordan_wigner
from qsfh_tpu.ops.pool import hubbard_interaction_pool_simplified


def _setup():
    p = HubbardProblem(2, 2, 1.0, 6.0, 4, 2, 2)
    pool = hubbard_interaction_pool_simplified(2, 2)[:5]
    rot = [jordan_wigner(g).rotation_terms() for g in pool]
    ops = [("rot", tuple(r), k) for k, r in enumerate(rot)]
    ops += givens_network_ops(p.n_qubits, p.diagonal, p.decomposition)
    psi0 = basis_state(p.n_qubits, p.spin_up_indices + p.spin_down_indices)
    return p, rot, ops, psi0


class TestAdjoint:
    def test_forward_matches_direct(self):
        p, rot, ops, psi0 = _setup()
        thetas = jnp.asarray([0.3, -0.2, 0.15, 0.4, -0.1], dtype=jnp.float64)
        loss = build_adjoint_energy(p.observables["H"], p.n_qubits, ops)
        e_adj = float(loss(thetas, psi0))

        psi = psi0
        for k, r in enumerate(rot):
            psi = generator_rotation(psi, p.n_qubits, r, thetas[k])
        psi = apply_givens_network(psi, p.n_qubits, p.diagonal, p.decomposition)
        e_direct = float(p.observables["H"].expectation(psi))
        np.testing.assert_allclose(e_adj, e_direct, atol=1e-10)

    def test_gradient_matches_backprop(self):
        p, rot, ops, psi0 = _setup()
        thetas = jnp.asarray([0.3, -0.2, 0.15, 0.4, -0.1], dtype=jnp.float64)
        loss = build_adjoint_energy(p.observables["H"], p.n_qubits, ops)
        g_adj = np.asarray(jax.jit(jax.grad(loss))(thetas, psi0))

        def backprop_loss(th):
            psi = psi0
            for k, r in enumerate(rot):
                psi = generator_rotation(psi, p.n_qubits, r, th[k])
            psi = apply_givens_network(psi, p.n_qubits, p.diagonal, p.decomposition)
            return p.observables["H"].expectation(psi)

        g_ref = np.asarray(jax.grad(backprop_loss)(thetas))
        np.testing.assert_allclose(g_adj, g_ref, atol=1e-9)

    def test_gradient_at_zero_matches_screening(self):
        """dE/dtheta at theta=0 must equal the ADAPT screening commutator."""
        p, rot, ops, psi0 = _setup()
        thetas = jnp.zeros(5, dtype=jnp.float64)
        loss = build_adjoint_energy(p.observables["H"], p.n_qubits, ops)
        g = np.asarray(jax.grad(loss)(thetas, psi0))
        # screening for the same 5 generators at the initial state
        from qsfh_tpu.engine.circuits import apply_givens_network_adjoint
        from qsfh_tpu.engine.expectation import PackedPool

        pool = PackedPool(
            [jordan_wigner(gen) for gen in hubbard_interaction_pool_simplified(2, 2)[:5]],
            p.n_qubits,
        )
        psi_r = apply_givens_network(psi0, p.n_qubits, p.diagonal, p.decomposition)
        w_r = p.observables["H"].apply(psi_r)
        w_k = apply_givens_network_adjoint(w_r, p.n_qubits, p.diagonal, p.decomposition)
        g_screen = np.asarray(pool.screen(psi0, w_k))
        np.testing.assert_allclose(g, g_screen, atol=1e-9)
