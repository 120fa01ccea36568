"""Amplitude-sharded HVA training step over a device mesh.

This is the multi-chip path the reference never had: the full 2^n-amplitude
statevector lives sharded across the ``amp`` mesh axis, every gate/observable
is expressed with the same fused kernels as the single-chip engine, and the
XLA SPMD partitioner lowers cross-shard flips (gates on high qubits) to
collective-permutes over ICI and the expectation reductions to ``psum``-style
all-reduces.  Compare SURVEY.md §2.3 / §5.7-5.8.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..algos.base import HubbardProblem
from ..algos.hva import hva_circuit
from ..engine.circuits import slater_prep_reim
from ..engine.state import from_reim, real_dtype
from .mesh import amp_sharding, constrain_amp, replicated


def build_sharded_hva_step(
    problem: HubbardProblem,
    reps: int,
    mesh,
    dtype=jnp.complex64,
    lr: float = 1e-2,
):
    """Return (step_fn, params0, opt_state0) for one sharded HVA train step.

    ``step_fn(params, opt_state) -> (params, opt_state, energy, grad_norm)``
    is jitted with the statevector constrained to amp sharding throughout;
    the (small) parameter pytree stays replicated.
    """
    p = problem
    h_gen, v_gen = p.hva_generators()
    h_rot = [g.rotation_terms() for g in h_gen]
    v_rot = [g.rotation_terms() for g in v_gen]
    rdt = real_dtype(dtype)
    coulomb_diag = p.coulomb_diagonal(dtype=rdt)

    psi0_reim = slater_prep_reim(
        p.n_qubits,
        p.spin_up_indices + p.spin_down_indices,
        p.diagonal,
        p.decomposition,
        dtype=dtype,
    )
    # stacked (2, 2^n) real array sharded on the amplitude axis
    psi0_reim = jax.device_put(
        psi0_reim, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "amp"))
    )
    coulomb_diag = jax.device_put(coulomb_diag, amp_sharding(mesh))
    obs_h = p.observables["H"]

    params0 = {
        "theta_U": jnp.zeros(reps + 1, dtype=rdt),
        "theta_v": jnp.zeros(reps * len(v_rot), dtype=rdt),
        "theta_h": jnp.zeros(reps * len(h_rot), dtype=rdt),
    }
    params0 = jax.device_put(params0, replicated(mesh))
    optimizer = optax.adam(lr)
    opt_state0 = optimizer.init(params0)

    pin = partial(constrain_amp, mesh=mesh)

    def loss_fn(params):
        psi0 = pin(from_reim(psi0_reim, dtype))
        psi = hva_circuit(
            psi0, p.n_qubits, coulomb_diag, v_rot, h_rot, reps, params, constrain=pin
        )
        return obs_h.expectation(pin(psi))

    grad_fn = jax.value_and_grad(loss_fn)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state):
        energy, grads = grad_fn(params)
        gnorm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, energy, gnorm

    return step, params0, opt_state0
