"""Fully sharded ADAPT-VQE training step over the explicit shard_map engine.

This is the capability the reference does not have at all: ADAPT on
lattices whose statevector exceeds one chip (4x4 = 32 qubits needs 2^32
complex64 = 32 GiB; on a 16-chip amp mesh each shard holds 2 GiB).  The
whole step -- k-space basis state, generator-rotation ansatz, Givens FT
network, grouped Hamiltonian expectation, gradient, Adam update -- runs
inside ONE shard_map/jit program; cross-shard amplitude exchange is XOR
ppermutes on the ``amp`` axis, reductions are psums.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from ..algos.base import HubbardProblem
from .shmap_engine import ShardedPauliEngine


def build_sharded_adapt_step(
    problem: HubbardProblem,
    pool_rot: Sequence,
    selected: Sequence[int],
    mesh,
    dtype=jnp.complex64,
    lr: float = 1e-2,
    gradient: str = "adjoint",
    lowering: str = "scan",
):
    """Return (step_fn, thetas0, opt_state0) for the sharded ADAPT step.

    ``pool_rot``: rotation_terms() per pool generator; ``selected``: pool
    indices forming the current ansatz (k-space, before the FT network,
    matching /root/reference/models/adapt_vqe.py:325-354).

    ``gradient="adjoint"`` (default) computes the gradient by reverse gate
    replay INSIDE the shard_map region -- three live sharded vectors (psi,
    H psi, the peeled state) regardless of depth.  This is what makes the
    32-qubit target feasible: plain backprop ("backprop") stores one
    2^n-amplitude residual per gate, i.e. hundreds of multi-GiB buffers at
    4x4, while the adjoint path stays O(1) in circuit depth (the sharded
    analog of qsfh_tpu/grad/adjoint.py, replacing the reference's
    Lightning-GPU C++ adjoint engine at >= 20 qubits,
    /root/reference/models/adapt_vqe.py:299-304).
    """
    p = problem
    engine = ShardedPauliEngine(p.n_qubits, mesh)
    occupied = tuple(p.spin_up_indices + p.spin_down_indices)
    rots = [tuple(pool_rot[i]) for i in selected]
    obs_op = p.qubit_hamiltonian
    rdt = jnp.zeros((), dtype).real.dtype

    from jax import shard_map
    from jax.lax import psum
    from jax.sharding import PartitionSpec as P

    from .shmap_engine import AMP_AXIS

    if lowering == "scan":
        from .sharded_compiled import (
            ShardedGivensNetwork,
            apply_generator_scan,
            generator_rotation_scan,
            generator_rotation_scan_inverse,
            pack_generator,
        )

        packed = [pack_generator(engine, rot) for rot in rots]
        network = ShardedGivensNetwork(engine, p.diagonal, p.decomposition)
        fwd_rot = lambda psi, slot, th: generator_rotation_scan(
            engine, psi, packed[slot], th
        )
        inv_rot = lambda psi, slot, th: generator_rotation_scan_inverse(
            engine, psi, packed[slot], th
        )
        gen_apply = lambda psi, slot: apply_generator_scan(engine, psi, packed[slot])
        net_fwd = lambda psi: network.apply(psi)
        net_inv = lambda psi: network.apply(psi, inverse=True)
    elif lowering == "unrolled":
        fwd_rot = lambda psi, slot, th: engine.generator_rotation_local(
            psi, rots[slot], th
        )
        inv_rot = lambda psi, slot, th: engine.generator_rotation_local(
            psi, rots[slot], -th
        )
        gen_apply = lambda psi, slot: engine.apply_generator_local(psi, rots[slot])
        net_fwd = lambda psi: engine.givens_network_local(
            psi, p.diagonal, p.decomposition
        )
        net_inv = lambda psi: engine.givens_network_inverse_local(
            psi, p.diagonal, p.decomposition
        )
    else:
        raise ValueError(f"unknown lowering: {lowering!r}")

    def local_loss(thetas):
        psi = engine.basis_state_local(occupied, dtype=dtype)
        for slot in range(len(rots)):
            psi = fwd_rot(psi, slot, thetas[slot])
        psi = net_fwd(psi)
        return engine.expectation_local(psi, obs_op)

    def local_value_and_grad(thetas):
        # forward
        psi = engine.basis_state_local(occupied, dtype=dtype)
        for slot in range(len(rots)):
            psi = fwd_rot(psi, slot, thetas[slot])
        psi = net_fwd(psi)
        # energy + analytic cotangent w = 2 H|psi> in one H application
        hpsi = engine.apply_paulisum_local(psi, obs_op)
        energy = psum(jnp.real(jnp.vdot(psi, hpsi)).astype(rdt), AMP_AXIS)
        lam = 2.0 * hpsi
        # reverse replay: peel the constant FT network off both vectors
        psi = net_inv(psi)
        lam = net_inv(lam)
        grads = jnp.zeros(len(rots), dtype=rdt)
        for slot in range(len(rots) - 1, -1, -1):
            gpsi = gen_apply(psi, slot)
            g = psum(jnp.imag(jnp.vdot(lam, gpsi)).astype(rdt), AMP_AXIS)
            grads = grads.at[slot].set(g)
            psi = inv_rot(psi, slot, thetas[slot])
            lam = inv_rot(lam, slot, thetas[slot])
        return energy, grads

    optimizer = optax.adam(lr)
    thetas0 = jnp.zeros(len(rots), dtype=rdt)
    # pre-place on the replicated mesh sharding so the FIRST step call has
    # the same input sharding as every later one (the step returns
    # mesh-replicated outputs; without this the second call recompiles)
    from .mesh import replicated

    thetas0 = jax.device_put(thetas0, replicated(mesh))
    opt_state0 = jax.device_put(optimizer.init(thetas0), replicated(mesh))

    if gradient == "adjoint":
        grad_fn = shard_map(
            local_value_and_grad,
            mesh=mesh,
            in_specs=(P(),),
            out_specs=(P(), P()),
            check_vma=False,
        )
    elif gradient == "backprop":
        sharded_loss = shard_map(
            local_loss, mesh=mesh, in_specs=(P(),), out_specs=P(), check_vma=False
        )
        grad_fn = jax.value_and_grad(sharded_loss)
    else:
        raise ValueError(f"unknown gradient mode: {gradient!r}")

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(thetas, opt_state):
        energy, grads = grad_fn(thetas)
        gnorm = jnp.linalg.norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state)
        thetas = optax.apply_updates(thetas, updates)
        return thetas, opt_state, energy, gnorm

    return step, thetas0, opt_state0
