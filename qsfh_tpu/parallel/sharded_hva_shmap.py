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
from ..engine.state import real_dtype
from .shmap_engine import AMP_AXIS, ShardedPauliEngine


def _hva_slots(engine, problem, reps):
    """(slots, n_params, network): the HVA rotation program.

    Program order matches the reference circuit (hva.py:276-298): the
    Givens network prepares the Slater state FIRST ('pre'), then reps x
    (U, vertical..., horizontal...) layers, then a final U layer.  Slot
    param layout matches ``qsfh_tpu.algos.hva.flatten_hva_params``.
    """
    from .sharded_compiled import ShardedGivensNetwork, pack_generator

    p = problem
    h_gen, v_gen = p.hva_generators()
    u_rot = jordan_wigner(p.interacting_term).rotation_terms()
    packed_u = pack_generator(engine, u_rot)
    packed_v = [pack_generator(engine, g.rotation_terms()) for g in v_gen]
    packed_h = [pack_generator(engine, g.rotation_terms()) for g in h_gen]
    Nv, Nh = len(packed_v), len(packed_h)
    slots = []
    for rep in range(reps):
        slots.append((packed_u, rep))
        for i in range(Nv):
            slots.append((packed_v[i], (reps + 1) + rep * Nv + i))
        for i in range(Nh):
            slots.append((packed_h[i], (reps + 1) + reps * Nv + rep * Nh + i))
    slots.append((packed_u, reps))
    n_params = (reps + 1) + reps * (Nv + Nh)
    network = ShardedGivensNetwork(engine, p.diagonal, p.decomposition)
    return slots, n_params, network, Nv, Nh


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
    rdt = real_dtype(dtype)

    from .sharded_compiled import adjoint_energy_grads

    slots, n_params, network, _, _ = _hva_slots(engine, p, reps)
    obs_op = p.qubit_hamiltonian

    def local_value_and_grad(thetas):
        energy, grads, _ = adjoint_energy_grads(
            engine, slots, thetas, occupied, network, "pre", obs_op,
            n_params, dtype,
        )
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


def build_sharded_hva_train_step(
    problem: HubbardProblem,
    reps: int,
    mesh,
    dtype=jnp.complex64,
    lr: float = 1e-2,
    gs_reim=(),
    metrics: bool = True,
    optimizer=None,
):
    """Driver-grade sharded HVA step: full metric surface.

    ``optimizer``: any optax optimizer; defaults to ``adam(lr)``.  The HVA
    driver passes its own so the step and the driver's opt_state always
    come from the same transformation.

    Returns (step, params0_dict, opt_state0) with
    ``step(params_dict, opt) -> (params_dict, opt, e, sz, s2, fid, gnorm)``
    -- the same 7-tuple as the single-chip ``HVA._build_step`` so the driver
    loop is lowering-agnostic.  ``gs_reim``: list of stacked-real (2, 2^n)
    exact ground states for the fidelity probe (sharded over the mesh;
    subspace projection when more than one, matching hva_for_3x3.py:305-312).
    """
    p = problem
    engine = ShardedPauliEngine(p.n_qubits, mesh)
    occupied = tuple(p.spin_up_indices + p.spin_down_indices)
    rdt = real_dtype(dtype)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from .sharded_compiled import adjoint_energy_grads, sharded_metrics_fn

    obs = p.observables
    slots, n_params, network, Nv, Nh = _hva_slots(engine, p, reps)

    gs_sharding = NamedSharding(mesh, P(None, AMP_AXIS))
    gs_args = tuple(jax.device_put(jnp.asarray(g), gs_sharding) for g in gs_reim)
    metrics_of = sharded_metrics_fn(
        engine, obs["Sz"].op, obs["S^2"].op, rdt, metrics
    )

    def local_fn(thetas, *gs_shards):
        energy, grads, (sz, s2, fid) = adjoint_energy_grads(
            engine, slots, thetas, occupied, network, "pre",
            p.qubit_hamiltonian, n_params, dtype,
            extras_fn=lambda psi: metrics_of(psi, gs_shards),
        )
        return energy, sz, s2, fid, grads

    from jax import shard_map

    sharded_fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(),) + (P(None, AMP_AXIS),) * len(gs_args),
        out_specs=(P(),) * 5,
        check_vma=False,
    )

    optimizer = optimizer if optimizer is not None else optax.adam(lr)
    from .mesh import replicated

    n_params = (reps + 1) + reps * (Nv + Nh)
    params0 = {
        "theta_U": jnp.zeros(reps + 1, dtype=rdt),
        "theta_v": jnp.zeros(reps * Nv, dtype=rdt),
        "theta_h": jnp.zeros(reps * Nh, dtype=rdt),
    }
    params0 = jax.device_put(params0, replicated(mesh))
    opt_state0 = jax.device_put(optimizer.init(params0), replicated(mesh))

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state):
        flat = jnp.concatenate(
            [params["theta_U"], params["theta_v"], params["theta_h"]]
        )
        energy, sz, s2, fid, gflat = sharded_fn(flat, *gs_args)
        grads = {
            "theta_U": gflat[: reps + 1],
            "theta_v": gflat[reps + 1 : reps + 1 + reps * Nv],
            "theta_h": gflat[reps + 1 + reps * Nv :],
        }
        gnorm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, energy, sz, s2, fid, gnorm

    return step, params0, opt_state0
