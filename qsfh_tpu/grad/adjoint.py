"""Adjoint-method circuit differentiation: O(1) statevector memory.

The reference switches to PennyLane-Lightning-GPU's C++/CUDA adjoint engine
at >= 20 qubits (``/root/reference/models/adapt_vqe.py:299-304``) because
backprop stores one statevector per gate.  This module is the TPU-native
equivalent: a ``jax.custom_vjp`` over the whole circuit that replays gates
in reverse (every gate here is a rotation, so the inverse is the negated
angle), keeping TWO live statevectors plus the cotangent regardless of
depth:

    psi_k      = U_k ... U_1 |psi0>       (recovered by inverse replay)
    lambda_k   = U_{k+1}^dag ... U_T^dag w
    dL/dtheta_k = Im <lambda_k | G_k | psi_k>    (for U_k = exp(-i theta G_k))

combined with the analytic expectation cotangent  w = 2 c_bar H |psi>
(:func:`expectation_value`), so no O(depth * 2^n) residuals are ever stored.

Program ops:
  ("rot",   rot_terms, param_index)  -- exp(-i theta G), differentiable
  ("fixed", tag, payload)            -- constant gate; tag in
                                        {"rz", "se", "x"} with static payload
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp

from ..engine import gates
from ..engine.expectation import Observable
from ..engine.state import real_dtype


def givens_network_ops(n_qubits: int, diagonal, decomposition) -> List[tuple]:
    """The Slater/FT Givens network as constant adjoint-program ops
    (fused form matching engine.circuits.apply_givens_network: one static
    RZ-layer op + one 4x4 per plan rotation)."""
    import numpy as np

    ops: List[tuple] = []
    angles = tuple(float(np.angle(diagonal[i])) for i in range(n_qubits))
    if n_qubits <= 22:
        ops.append(("fixed", "rzlayer", angles))
    else:  # 2^n host phase vector too large; fall back to per-qubit gates
        for i in range(n_qubits):
            ops.append(("fixed", "rz", (angles[i], i)))
    for parallel_ops in reversed(decomposition):
        for op in parallel_ops:
            if op == "pht":
                ops.append(("fixed", "x", (n_qubits - 1,)))
            else:
                i, j, theta, phi = op
                M = gates.givens_plan_matrix(float(theta), float(phi))
                ops.append(("fixed", "u4", (tuple(map(complex, M.ravel())), i, j)))
    return ops


def _apply_op(psi, n, op, thetas, direction=1):
    kind = op[0]
    if kind == "rot":
        _, rot_terms, p_idx = op
        return gates.generator_rotation(psi, n, rot_terms, direction * thetas[p_idx])
    _, tag, payload = op
    if tag == "rz":
        phi, q = payload
        return gates.rz(psi, n, direction * phi, q)
    if tag == "rzlayer":
        import numpy as np

        from ..engine.state import const_complex

        angles = [direction * a for a in payload]
        phases = gates.static_rz_layer_phases(angles, n)
        return psi * const_complex(phases, psi.dtype)
    if tag == "u4":
        import numpy as np

        flat, i, j = payload
        M = np.array(flat, dtype=np.complex128).reshape(4, 4)
        if direction < 0:
            M = M.conj().T
        return gates.apply_two_qubit(psi, n, M, i, j)
    if tag == "se":
        ang, i, j = payload
        return gates.single_excitation(psi, n, direction * ang, i, j)
    if tag == "x":
        return gates.pauli_x(psi, n, payload[0])
    raise ValueError(f"unknown op {op}")


def _apply_generator(psi, n, rot_terms):
    """G|psi> for G = sum scale * P (the rotation generator)."""
    out = jnp.zeros_like(psi)
    for (x, z, scale) in rot_terms:
        out = out + scale * gates.apply_pauli_string(psi, n, x, z)
    return out


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def adjoint_apply(n: int, ops: tuple, psi0: jnp.ndarray, thetas: jnp.ndarray):
    """|psi> = U_T(theta) ... U_1(theta) |psi0> with adjoint-mode gradients."""
    psi = psi0
    for op in ops:
        psi = _apply_op(psi, n, op, thetas)
    return psi


def _adjoint_fwd(n, ops, psi0, thetas):
    psi = adjoint_apply(n, ops, psi0, thetas)
    return psi, (psi, thetas)


def _adjoint_bwd(n, ops, res, w):
    psi, thetas = res
    rdt = real_dtype(psi.dtype)
    grads = jnp.zeros_like(thetas)
    lam = w
    for op in reversed(ops):
        if op[0] == "rot":
            _, rot_terms, p_idx = op
            gpsi = _apply_generator(psi, n, rot_terms)
            # JAX vjp convention: contribution = Re <w | dpsi/dtheta>
            #                    = Re <lam | -i G psi> = Im <lam | G psi>
            grads = grads.at[p_idx].add(
                jnp.imag(jnp.vdot(lam, gpsi)).astype(rdt)
            )
        psi = _apply_op(psi, n, op, thetas, direction=-1)
        lam = _apply_op(lam, n, op, thetas, direction=-1)
    return lam, grads  # psi0 cotangent: lam = U_1^dag ... U_T^dag w


adjoint_apply.defvjp(_adjoint_fwd, _adjoint_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def expectation_value(obs: Observable, psi: jnp.ndarray):
    """Re <psi|H|psi> with the analytic cotangent  w = 2 c_bar H|psi>.

    Plain autodiff through the grouped expectation stores one 2^n
    intermediate per flip-mask group; the analytic rule stores only psi.
    """
    return obs.expectation(psi)


def _expect_fwd(obs, psi):
    return obs.expectation(psi), psi


def _expect_bwd(obs, psi, cbar):
    return ((2.0 * cbar) * obs.apply(psi),)


expectation_value.defvjp(_expect_fwd, _expect_bwd)


def build_adjoint_energy(obs: Observable, n: int, ops: Sequence[tuple]):
    """loss(thetas, psi0) -> Re<psi|H|psi> with O(1)-memory gradients."""
    ops = tuple(ops)

    def loss(thetas, psi0):
        psi = adjoint_apply(n, ops, psi0, thetas)
        return expectation_value(obs, psi)

    return loss
