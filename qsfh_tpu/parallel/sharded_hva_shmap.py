"""Explicit shard_map HVA training step: scan-lowered, adjoint gradients.

The GSPMD path (:mod:`.sharded_hva`) is the idiomatic single-annotation
form, but at 4x4 = 32 qubits it hits the same two walls as the unrolled
ADAPT step: value_and_grad backprop stores one 2^n residual per gate, and
its Coulomb layer consumes a host-precomputed 2^n diagonal vector.  This
step builds the U layer as Z-string rotation scans instead (JW of
U n_up n_down is a sum of commuting Z/ZZ strings -- no 2^n host constant at
any qubit count), lowers every hopping generator to a constant-size scan
(all JW strings of c^dag_i c_j + h.c. share one x-flip mask), and computes
gradients by reverse replay inside the shard_map region: O(1) statevector
memory in depth, O(generators) program size.

Parameter layout matches ``qsfh_tpu.algos.hva.flatten_hva_params``:
``[theta_U (reps+1) | theta_v (reps*Nv) | theta_h (reps*Nh)]``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..algos.base import HubbardProblem
from ..ops.jw import jordan_wigner
from .shmap_engine import AMP_AXIS, ShardedPauliEngine


def build_sharded_hva_step_shmap(
    problem: HubbardProblem,
    reps: int,
    mesh,
    dtype=jnp.complex64,
    lr: float = 1e-2,
):
    """Return (step_fn, params0, opt_state0); params0 is the flat theta vector."""
    p = problem
    engine = ShardedPauliEngine(p.n_qubits, mesh)
    occupied = tuple(p.spin_up_indices + p.spin_down_indices)
    rdt = jnp.zeros((), dtype).real.dtype

    from .sharded_compiled import (
        ShardedGivensNetwork,
        generator_rotation_scan,
        generator_rotation_scan_inverse,
        apply_generator_scan,
        pack_generator,
    )

    h_gen, v_gen = p.hva_generators()
    u_rot = jordan_wigner(p.interacting_term).rotation_terms()
    packed_u = pack_generator(engine, u_rot)
    packed_v = [pack_generator(engine, g.rotation_terms()) for g in v_gen]
    packed_h = [pack_generator(engine, g.rotation_terms()) for g in h_gen]
    Nv, Nh = len(packed_v), len(packed_h)
    network = ShardedGivensNetwork(engine, p.diagonal, p.decomposition)
    obs_op = p.qubit_hamiltonian

    # program: prep(net) FIRST, then reps x (U, v..., h...) layers, then U
    # -- matching the reference circuit order (hva.py:276-298): prep is the
    # Slater state, ansatz acts in real space after it.
    slots = []  # (packed, param_index) in application order
    for rep in range(reps):
        slots.append((packed_u, rep))
        for i in range(Nv):
            slots.append((packed_v[i], (reps + 1) + rep * Nv + i))
        for i in range(Nh):
            slots.append((packed_h[i], (reps + 1) + reps * Nv + rep * Nh + i))
    slots.append((packed_u, reps))
    n_params = (reps + 1) + reps * (Nv + Nh)

    def local_value_and_grad(thetas):
        psi = engine.basis_state_local(occupied, dtype=dtype)
        psi = network.apply(psi)  # Slater prep (constant)
        for packed, k in slots:
            psi = generator_rotation_scan(engine, psi, packed, thetas[k])
        hpsi = engine.apply_paulisum_local(psi, obs_op)
        energy = jax.lax.psum(jnp.real(jnp.vdot(psi, hpsi)).astype(rdt), AMP_AXIS)
        lam = 2.0 * hpsi
        grads = jnp.zeros(n_params, dtype=rdt)
        for packed, k in reversed(slots):
            gpsi = apply_generator_scan(engine, psi, packed)
            g = jax.lax.psum(jnp.imag(jnp.vdot(lam, gpsi)).astype(rdt), AMP_AXIS)
            grads = grads.at[k].add(g)
            psi = generator_rotation_scan_inverse(engine, psi, packed, thetas[k])
            lam = generator_rotation_scan_inverse(engine, lam, packed, thetas[k])
        return energy, grads

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    grad_fn = shard_map(
        local_value_and_grad,
        mesh=mesh,
        in_specs=(P(),),
        out_specs=(P(), P()),
        check_vma=False,
    )

    optimizer = optax.adam(lr)
    from .mesh import replicated

    params0 = jax.device_put(jnp.zeros(n_params, dtype=rdt), replicated(mesh))
    opt_state0 = jax.device_put(optimizer.init(params0), replicated(mesh))

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state):
        energy, grads = grad_fn(params)
        gnorm = jnp.linalg.norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, energy, gnorm

    return step, params0, opt_state0
