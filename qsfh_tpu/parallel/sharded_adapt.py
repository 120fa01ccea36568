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
):
    """Return (step_fn, thetas0, opt_state0) for the sharded ADAPT step.

    ``pool_rot``: rotation_terms() per pool generator; ``selected``: pool
    indices forming the current ansatz (k-space, before the FT network,
    matching /root/reference/models/adapt_vqe.py:325-354).
    """
    p = problem
    engine = ShardedPauliEngine(p.n_qubits, mesh)
    occupied = tuple(p.spin_up_indices + p.spin_down_indices)
    rots = [tuple(pool_rot[i]) for i in selected]
    obs_op = p.qubit_hamiltonian
    rdt = jnp.zeros((), dtype).real.dtype

    def local_loss(thetas):
        psi = engine.basis_state_local(occupied, dtype=dtype)
        for slot, rot in enumerate(rots):
            psi = engine.generator_rotation_local(psi, rot, thetas[slot])
        psi = engine.givens_network_local(psi, p.diagonal, p.decomposition)
        return engine.expectation_local(psi, obs_op)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    sharded_loss = shard_map(
        local_loss, mesh=mesh, in_specs=(P(),), out_specs=P(), check_vma=False
    )

    optimizer = optax.adam(lr)
    thetas0 = jnp.zeros(len(rots), dtype=rdt)
    opt_state0 = optimizer.init(thetas0)

    grad_fn = jax.value_and_grad(sharded_loss)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(thetas, opt_state):
        energy, grads = grad_fn(thetas)
        gnorm = jnp.linalg.norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state)
        thetas = optax.apply_updates(thetas, updates)
        return thetas, opt_state, energy, gnorm

    return step, thetas0, opt_state0
