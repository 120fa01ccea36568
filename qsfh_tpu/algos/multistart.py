"""Batched multistart VQE: B parameter sets of one ansatz trained concurrently.

No reference counterpart: the reference optimizes exactly one parameter
vector per process (``/root/reference/models/hva.py:305-355``), and whether
a run escapes the 2x2 half-filling symmetry saddle is decided by a single
random init.  Here the init batch IS the program: ``jax.vmap`` lifts the
circuit over a leading ``start`` axis, the full optimization is ONE jitted
``lax.scan`` (program size constant in ``n_epoch``), and the batch axis
shards over a device mesh as pure data parallelism.

TPU rationale
-------------
- At 8-16 qubits a single 2^n statevector underfeeds the VPU lanes and the
  (rows, 128) lane-matmul XOR path; a leading batch axis multiplies
  arithmetic intensity with the same program.  All gate kernels in
  ``engine/gates.py`` are shape-polymorphic in leading axes, so ``vmap``
  lowers to the identical fused HLO with one extra major dimension.
- Sharding the ``start`` axis is the framework's data-parallel axis
  (PARITY.md "pool-parallel" is DP over pool terms; this is DP over
  replicas): every start is independent, so the scan body compiles to
  ZERO collectives -- only the final argmin reduces across devices.
- The whole restart study is one program: no per-start Python dispatch,
  no per-start compile, and tunnel-safe ABI (stacked-real boundary; the
  statevector is complex only inside the program).
"""

from __future__ import annotations

import warnings
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import optax

from ..engine.circuits import slater_prep_reim
from ..engine.state import from_reim, real_dtype
from .base import HubbardProblem, default_dtype
from .hva import hva_circuit
from .hea import hea_circuit

START_AXIS = "start"


def start_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the multistart batch axis (data parallelism)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (START_AXIS,))


def batched_train(loss_fn, batch_params, optimizer, n_epoch, mesh: Optional[Mesh] = None):
    """Train every leading-axis row of ``batch_params`` independently.

    One jitted program: ``lax.scan`` over ``n_epoch`` Adam steps of
    ``vmap(value_and_grad(loss_fn))``.  The optimizer state is initialized
    INSIDE the jit so its sharding propagates from the (possibly
    mesh-sharded) parameters and no eager host programs are dispatched
    (tunnel-service hygiene, see ``bench.py:_host_adam_state``).

    Returns ``(final_params, energy_traj, final_energies)`` where
    ``energy_traj[e, b]`` is start ``b``'s energy BEFORE update ``e`` and
    ``final_energies[b]`` is evaluated at the final parameters.
    """
    vg = jax.vmap(jax.value_and_grad(loss_fn))
    vloss = jax.vmap(loss_fn)

    def body(carry, _):
        params, opt = carry
        vals, grads = vg(params)
        updates, opt = optimizer.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        return (params, opt), vals

    def run(params):
        opt = optimizer.init(params)
        (params, _), traj = lax.scan(body, (params, opt), None, length=n_epoch)
        return params, traj, vloss(params)

    if mesh is not None:
        sh = NamedSharding(mesh, P(START_AXIS))
        batch_params = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sh), batch_params
        )
    return jax.jit(run)(batch_params)


class MultistartHVA:
    """B-start HVA study of one Hubbard instance in a single program.

    Ctor physics surface matches ``HVA`` (reference ``models/hva.py:118``);
    ``n_starts`` replaces the reference's implicit single zero-init, and
    ``init_scale`` sets the uniform(-s, s) init band (zero init is the
    reference's saddle -- a batch of perturbed inits is the point).
    """

    def __init__(
        self,
        n_starts: int,
        n_epoch: int,
        reps: int,
        lr: float,
        x_dimension: int = 2,
        y_dimension: int = 2,
        n_electrons: int = 4,
        n_spin_up: int = 2,
        n_spin_down: int = 2,
        tunneling: float = 1.0,
        coulomb: float = 6.0,
        periodic: bool = True,
        init_scale: float = 0.1,
        seed: int = 0,
        dtype=None,
        mesh_devices: Optional[int] = None,
        ground_truth: bool = True,
        results_root: str = "./results",
    ):
        if n_starts < 1:
            raise ValueError("n_starts must be >= 1")
        if mesh_devices and n_starts % mesh_devices:
            raise ValueError(
                f"n_starts={n_starts} must divide evenly over "
                f"mesh_devices={mesh_devices}"
            )
        self.n_starts = n_starts
        self.n_epoch = n_epoch
        self.reps = reps
        self.lr = lr
        self.dtype = dtype or default_dtype()

        p = HubbardProblem(
            x_dimension=x_dimension,
            y_dimension=y_dimension,
            tunneling=tunneling,
            coulomb=coulomb,
            n_electrons=n_electrons,
            n_spin_up=n_spin_up,
            n_spin_down=n_spin_down,
            periodic=periodic,
            results_root=results_root,
        )
        self.problem = p
        h_gen, v_gen = p.hva_generators()
        self._h_rot = [g.rotation_terms() for g in h_gen]
        self._v_rot = [g.rotation_terms() for g in v_gen]
        rdt = real_dtype(self.dtype)
        self._rdt = rdt
        self._coulomb_diag = p.coulomb_diagonal(dtype=rdt)
        self._psi0_reim = slater_prep_reim(
            p.n_qubits,
            p.spin_up_indices + p.spin_down_indices,
            p.diagonal,
            p.decomposition,
            dtype=self.dtype,
        )
        self._obs_h = p.observables["H"]

        Nv, Nh = len(self._v_rot), len(self._h_rot)
        rng = np.random.default_rng(seed)

        def init(shape):
            return jnp.asarray(
                rng.uniform(-init_scale, init_scale, shape).astype(rdt)
            )

        B = n_starts
        self.batch_params = {
            "theta_U": init((B, reps + 1)),
            "theta_v": init((B, reps * Nv)),
            "theta_h": init((B, reps * Nh)),
        }
        self.mesh = start_mesh(mesh_devices) if mesh_devices else None
        self.ground_state_energy = (
            float(p.ground_state()[0]) if ground_truth else None
        )

    def loss(self, params):
        psi = hva_circuit(
            from_reim(self._psi0_reim, self.dtype),
            self.problem.n_qubits,
            self._coulomb_diag,
            self._v_rot,
            self._h_rot,
            self.reps,
            params,
        )
        return self._obs_h.expectation(psi)

    def run(self) -> dict:
        return _run_batched(
            self.loss, self.batch_params, self.lr, self.n_epoch, self.mesh,
            reference_energy=self.ground_state_energy,
            reference_key="ground_state_energy",
        )


def _run_batched(loss, batch_params, lr, n_epoch, mesh,
                 reference_energy=None, reference_key="reference_energy"):
    final_params, traj, final_e = batched_train(
        loss, batch_params, optax.adam(lr), n_epoch, mesh=mesh
    )
    e = np.asarray(final_e)
    traj = np.asarray(traj)
    finite = np.isfinite(e)
    if not finite.any():
        raise RuntimeError(
            f"all {e.size} starts diverged to non-finite final energies"
        )
    if not finite.all():
        warnings.warn(
            f"{int((~finite).sum())}/{e.size} starts ended non-finite; "
            "selecting best among finite starts",
            stacklevel=2,
        )
    best = int(np.nanargmin(np.where(finite, e, np.inf)))
    result = {
        "energies": traj,
        "final_energies": e,
        "best_index": best,
        "best_energy": float(e[best]),
        "best_params": jax.tree_util.tree_map(
            lambda v: np.asarray(v[best]), final_params
        ),
    }
    if reference_energy is not None:
        result[reference_key] = float(reference_energy)
        result["best_gap"] = float(e[best] - reference_energy)
    return result


class MultistartHEA:
    """B-start hardware-efficient VQE on a molecule in a single program.

    The reference's HEA inits at uniform(-pi, pi) (``models/vqe_hea.py:39``)
    -- a rugged landscape where a single draw routinely strands in a local
    minimum.  Ctor surface matches ``hea.VQE`` plus ``n_starts``; the batch
    trains in one jitted scan (see module docstring) and the gap is
    reported against the molecule's FCI energy when available.
    """

    def __init__(
        self,
        molecule,
        n_starts: int,
        n_epoch: int,
        reps: int,
        lr: float,
        seed: int = 0,
        dtype=None,
        mesh_devices: Optional[int] = None,
    ):
        from ..ops.jw import jordan_wigner
        from ..engine.expectation import Observable

        if n_starts < 1:
            raise ValueError("n_starts must be >= 1")
        if mesh_devices and n_starts % mesh_devices:
            raise ValueError(
                f"n_starts={n_starts} must divide evenly over "
                f"mesh_devices={mesh_devices}"
            )
        self.molecule = molecule
        self.n_starts = n_starts
        self.n_epoch = n_epoch
        self.reps = reps
        self.lr = lr
        self.dtype = dtype or default_dtype()
        self.n_qubits = molecule.n_qubits

        qubit_h = jordan_wigner(molecule.get_molecular_hamiltonian())
        self._obs = Observable(qubit_h, self.n_qubits)

        rdt = real_dtype(self.dtype)
        rng = np.random.default_rng(seed)
        # the reference's +-pi band, one draw per start
        self.batch_params = jnp.asarray(
            rng.uniform(
                -np.pi, np.pi, (n_starts, reps + 1, self.n_qubits, 3)
            ).astype(rdt)
        )
        self.mesh = start_mesh(mesh_devices) if mesh_devices else None
        self.fci_energy = getattr(molecule, "fci_energy", None)

    def loss(self, params):
        psi = hea_circuit(params, self.n_qubits, self.reps, self.dtype)
        return self._obs.expectation(psi)

    def run(self) -> dict:
        return _run_batched(
            self.loss, self.batch_params, self.lr, self.n_epoch, self.mesh,
            reference_energy=self.fci_energy, reference_key="fci_energy",
        )
