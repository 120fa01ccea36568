"""Hamiltonian-Variational-Ansatz VQE driver.

TPU-native rebuild of ``/root/reference/models/hva.py`` (class HVA :117) and
its degenerate-subspace variant ``hva_for_3x3.py``:

* state prep = precomputed Slater determinant (computed ONCE as a constant,
  not re-executed gate-by-gate every step as in the reference circuit)
* each Coulomb Trotter layer = one fused diagonal pass
* each hopping color class = fused exp(-i theta P) rotations
* energy/Sz/S^2/fidelity all come out of a single jitted train step with
  ``jax.value_and_grad`` + optax Adam (the reference runs three separate
  QNode evaluations per iteration, hva.py:320-327)
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..engine.circuits import slater_prep_reim
from ..engine.gates import diagonal_rotation, generator_rotation
from ..engine.state import from_reim, real_dtype, to_reim_host, fidelity as state_fidelity, subspace_fidelity
from ..io import checkpoint as ckpt
from ..io.metrics import MetricsLogger, plot_energy_fidelity
from .base import HubbardProblem, default_dtype


def hva_program(reps, v_rot, h_rot, coulomb_diag_np):
    """The HVA ansatz as a compiled-engine op program over a FLAT theta
    vector laid out [theta_U (reps+1) | theta_v (reps*Nv) | theta_h (reps*Nh)].

    The Coulomb layer uses the precomputed diagonal weight vector (one fused
    elementwise pass per layer).
    """
    Nv, Nh = len(v_rot), len(h_rot)
    ops = []
    for rep in range(reps):
        ops.append(("diag", coulomb_diag_np, rep))
        for i, rot in enumerate(v_rot):
            ops.append(("rot", tuple(rot), (reps + 1) + rep * Nv + i))
        for i, rot in enumerate(h_rot):
            ops.append(("rot", tuple(rot), (reps + 1) + reps * Nv + rep * Nh + i))
    ops.append(("diag", coulomb_diag_np, reps))
    return ops


def hva_program_rot(reps, v_rot, h_rot, u_rot):
    """Single-segment variant: the Coulomb layer as shared-parameter Z-string
    rotations (JW of the U term is a sum of commuting Z/ZZ strings), so the
    WHOLE circuit lowers to one homogeneous rot scan -- the form fragile
    remote TPU compile services digest (one small program, any depth).
    """
    Nv, Nh = len(v_rot), len(h_rot)
    ops = []
    for rep in range(reps):
        ops.append(("rot", tuple(u_rot), rep))
        for i, rot in enumerate(v_rot):
            ops.append(("rot", tuple(rot), (reps + 1) + rep * Nv + i))
        for i, rot in enumerate(h_rot):
            ops.append(("rot", tuple(rot), (reps + 1) + reps * Nv + rep * Nh + i))
    ops.append(("rot", tuple(u_rot), reps))
    return ops


def flatten_hva_params(params):
    return jnp.concatenate([params["theta_U"], params["theta_v"], params["theta_h"]])


def hva_circuit(psi0, n_qubits, coulomb_diag, v_rot, h_rot, reps, params, constrain=None):
    """The HVA ansatz as a free function (layer order: hva.py:292-298).

    ``constrain`` (optional) pins a sharding after every Trotter layer so the
    amplitude-sharded multi-chip path keeps the statevector distributed.
    """
    n = n_qubits
    Nv, Nh = len(v_rot), len(h_rot)
    psi = psi0
    for rep in range(reps):
        psi = diagonal_rotation(psi, coulomb_diag, params["theta_U"][rep])
        for i, rot in enumerate(v_rot):
            psi = generator_rotation(psi, n, rot, params["theta_v"][rep * Nv + i])
        for i, rot in enumerate(h_rot):
            psi = generator_rotation(psi, n, rot, params["theta_h"][rep * Nh + i])
        if constrain is not None:
            psi = constrain(psi)
    psi = diagonal_rotation(psi, coulomb_diag, params["theta_U"][reps])
    return psi


class HVA:
    def __init__(
        self,
        n_epoch: int,
        reps: int,
        lr: float,
        threshold: float = 0.0,
        x_dimension: int = 2,
        y_dimension: int = 2,
        n_electrons: int = 4,
        n_spin_up: int = 2,
        n_spin_down: int = 2,
        tunneling: float = 1.0,
        coulomb: float = 6.0,
        periodic: bool = True,
        spinless: bool = False,
        particle_hole_symmetry: bool = False,
        load_model: bool = False,
        dtype=None,
        degenerate_subspace: int = 0,
        early_stop: bool = False,
        results_root: str = "./results",
        plot: bool = True,
        log_metrics: bool = True,
        checkpoint_every: int = 10,
        ground_truth: bool = True,
        circuit_mode: str = "auto",
        mesh_devices: int = 1,
    ):
        self.n_epoch = n_epoch
        self.reps = reps
        self.lr = lr
        self.threshold = threshold
        self.early_stop = early_stop
        self.plot = plot
        self.checkpoint_every = checkpoint_every
        self.dtype = dtype or default_dtype()
        if circuit_mode == "auto":
            # split stages everywhere: measured on CPU the single-rot-segment
            # scan + adjoint reverse is 14-39x faster than unrolled backprop
            # (0.8/9.7/1414 ms/iter at 8/12/18 qubits vs 11/302/54567) and on
            # remote TPU backends its constant-size programs are the only
            # form the compile-service ceiling digests.
            circuit_mode = "split"
        if circuit_mode not in ("split", "unrolled"):
            raise ValueError(
                f"circuit_mode={circuit_mode!r}: use 'split' (default) or "
                "'unrolled' (cross-check lowering)"
            )
        self.circuit_mode = circuit_mode

        self.problem = HubbardProblem(
            x_dimension,
            y_dimension,
            tunneling,
            coulomb,
            n_electrons,
            n_spin_up,
            n_spin_down,
            periodic=periodic,
            spinless=spinless,
            particle_hole_symmetry=particle_hole_symmetry,
            results_root=results_root,
        )
        p = self.problem
        self.n_qubits = p.n_qubits

        # ansatz structure
        self.h_generators, self.v_generators = p.hva_generators()
        self.Nh, self.Nv = len(self.h_generators), len(self.v_generators)
        self._h_rot = [g.rotation_terms() for g in self.h_generators]
        self._v_rot = [g.rotation_terms() for g in self.v_generators]
        rdt = real_dtype(self.dtype)
        self._coulomb_diag = p.coulomb_diagonal(dtype=rdt)

        # constant initial state (Slater determinant of occupied k-modes),
        # stored as stacked real/imag for the complex-free jit ABI
        self._psi0_reim = slater_prep_reim(
            p.n_qubits,
            p.spin_up_indices + p.spin_down_indices,
            p.diagonal,
            p.decomposition,
            dtype=self.dtype,
        )

        # exact ground truth (cached); ground_truth=False skips the ED solve
        # entirely (benchmarking / compile-check paths where only the energy
        # matters and fidelity is reported as 0)
        self.degenerate_subspace = degenerate_subspace
        if not ground_truth:
            self.ground_state_energy = None
            self._gs_reim = []
        elif degenerate_subspace:
            self.ground_state_energy, gs = p.ground_state(
                degenerate=True, n_states=degenerate_subspace
            )
            self._gs_reim = [to_reim_host(w, self.dtype) for w in gs]
        else:
            self.ground_state_energy, gs = p.ground_state()
            self._gs_reim = [to_reim_host(gs, self.dtype)]

        tag = p.tag("HVA", reps=reps)
        self.img_filepath = f"./images/{tag}.png"
        self.result_filepath = os.path.join(results_root, "vqe_results", tag + ".json")
        self.model_filepath = os.path.join(results_root, "saved_model", tag + ".npz")
        self.metrics = MetricsLogger(
            os.path.join(results_root, "vqe_results", tag + ".jsonl") if log_metrics else None
        )

        if load_model:
            self.load_model()
        else:
            self.params = {
                "theta_U": jnp.asarray(np.zeros(reps + 1, dtype=rdt)),
                "theta_v": jnp.asarray(np.zeros(reps * self.Nv, dtype=rdt)),
                "theta_h": jnp.asarray(np.zeros(reps * self.Nh, dtype=rdt)),
            }
            self.results = {"loss": [], "Sz": [], "S^2": [], "fidelity": []}

        # multi-chip training: amplitude-shard the statevector over a device
        # mesh (the capability the reference delegates to a single CUDA GPU,
        # adapt_vqe.py:299-304; here it is a first-class driver mode)
        self.mesh_devices = int(mesh_devices)

        self.optimizer = optax.adam(lr)
        self._step = self._build_step()

    # -- circuit ----------------------------------------------------------------

    def circuit(self, params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Ansatz: reps x (Coulomb, vertical hops, horizontal hops) + Coulomb.

        Layer order matches /root/reference/models/hva.py:292-298.
        """
        return hva_circuit(
            from_reim(self._psi0_reim, self.dtype),
            self.n_qubits,
            self._coulomb_diag,
            self._v_rot,
            self._h_rot,
            self.reps,
            params,
        )

    def state(self, params=None) -> jnp.ndarray:
        return self.circuit(self.params if params is None else params)

    # -- training ------------------------------------------------------------------

    def _build_step_split(self):
        """Separately jitted stages + adjoint reverse scan (see ADAPT)."""
        from ..engine.compiled import CompiledCircuit, run_rot_adjoint
        from ..ops.jw import jordan_wigner

        obs = self.problem.observables
        gs_reim = self._gs_reim
        u_rot = jordan_wigner(self.problem.interacting_term).rotation_terms()
        cc = CompiledCircuit(
            hva_program_rot(self.reps, self._v_rot, self._h_rot, u_rot),
            self.n_qubits,
        )
        assert len(cc.segments) == 1 and cc.segments[0].kind == "rot"
        seg = cc.segments[0]
        psi0_reim = self._psi0_reim
        optimizer = self.optimizer
        n_U = self.reps + 1
        n_v = self.reps * self.Nv

        # reim stage boundaries: the axon backend cannot consume another
        # program's complex output (complex-free jit ABI, engine.state)
        from ..engine.state import to_reim

        dt = self.dtype

        def fwd_from_raw(p0_r, th):
            # |psi0> as a host input: tracing the basis one-hot costs the
            # remote compile service ~2 min at 18q (tpu_bisect_basis.jsonl)
            return to_reim(cc.apply(from_reim(p0_r, dt), th))

        def fwd_raw(th):
            return fwd_from_raw(psi0_reim, th)

        def energy_raw(psi_r):
            return obs["H"].expectation_scan(from_reim(psi_r, dt))

        def cotangent_raw(psi_r):
            return to_reim(2.0 * obs["H"].apply_scan(from_reim(psi_r, dt)))

        def adjoint_raw(psi_r, lam_r, th):
            return run_rot_adjoint(
                seg, from_reim(psi_r, dt), from_reim(lam_r, dt), th, self.n_qubits
            )[2]

        fwd = jax.jit(fwd_raw)
        energy_fn = jax.jit(energy_raw)
        cot_fn = jax.jit(cotangent_raw)
        adj_fn = jax.jit(adjoint_raw)

        def metrics_fn(psi_r):
            # scan lowering: S^2 has ~150 flip-mask groups at 3x3 and the
            # unrolled expectation exceeds the remote compile ceiling
            psi = from_reim(psi_r, dt)
            sz = obs["Sz"].expectation_scan(psi)
            s2 = obs["S^2"].expectation_scan(psi)
            gs_states = [from_reim(g, psi.dtype) for g in gs_reim]
            if len(gs_states) > 1:
                fid = subspace_fidelity(psi, gs_states)
            elif len(gs_states) == 1:
                fid = state_fidelity(psi, gs_states[0])
            else:
                fid = jnp.zeros((), dtype=real_dtype(dt))
            return sz, s2, fid

        metrics_jit = jax.jit(metrics_fn)

        def update_fn(flat, grads, params, opt_state):
            gnorm = jnp.linalg.norm(grads)
            gdict = {
                "theta_U": grads[:n_U],
                "theta_v": grads[n_U : n_U + n_v],
                "theta_h": grads[n_U + n_v :],
            }
            updates, opt_state = optimizer.update(gdict, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, gnorm

        update_jit = jax.jit(update_fn)

        def step(params, opt_state):
            flat = flatten_hva_params(params)
            psi_r = fwd(flat)
            energy = energy_fn(psi_r)
            grads = adj_fn(psi_r, cot_fn(psi_r), flat)
            sz, s2, fid = metrics_jit(psi_r)
            params, opt_state, gnorm = update_jit(flat, grads, params, opt_state)
            return params, opt_state, energy, sz, s2, fid, gnorm

        # raw (unjitted) per-stage closures, same shape as ADAPT's
        # step.raw_stages (update takes (flat, grads, params, opt_state)
        # here -- HVA params are a dict): benchmarks compose them into one
        # fused program (benchmarks/tpu_step_hva.py)
        step.raw_stages = {
            "fwd": fwd_raw,
            "fwd_from": fwd_from_raw,
            "energy": energy_raw,
            "cotangent": cotangent_raw,
            "adjoint": adjoint_raw,
            "metrics": metrics_fn,
            "update": update_fn,
        }
        return step

    def _build_step(self):
        obs = self.problem.observables
        gs_reim = self._gs_reim

        if self.mesh_devices > 1:
            from ..parallel import amplitude_mesh
            from ..parallel.sharded_hva_shmap import build_sharded_hva_train_step

            mesh = amplitude_mesh(self.mesh_devices)
            step, params0, _ = build_sharded_hva_train_step(
                self.problem,
                self.reps,
                mesh,
                dtype=self.dtype,
                lr=self.lr,
                gs_reim=[jnp.asarray(g) for g in gs_reim],
                optimizer=self.optimizer,
            )
            # re-place the driver's params on the mesh so every step call
            # hits one compiled executable
            import jax as _jax

            from ..parallel.mesh import replicated

            self.params = _jax.device_put(self.params, replicated(mesh))
            return step

        if self.circuit_mode == "split":
            return self._build_step_split()

        else:  # "unrolled" cross-check lowering

            def loss_fn(params):
                psi = self.circuit(params)
                return obs["H"].expectation(psi), psi

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def step(params, opt_state):
            (energy, psi), grads = grad_fn(params)
            sz = obs["Sz"].expectation(psi)
            s2 = obs["S^2"].expectation(psi)
            gs_states = [from_reim(g, psi.dtype) for g in gs_reim]
            if len(gs_states) > 1:
                fid = subspace_fidelity(psi, gs_states)
            elif len(gs_states) == 1:
                fid = state_fidelity(psi, gs_states[0])
            else:
                fid = jnp.zeros((), dtype=energy.dtype)
            gnorm = optax.global_norm(grads)
            updates, opt_state = self.optimizer.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, energy, sz, s2, fid, gnorm

        return jax.jit(step)

    def run(self):
        # resume the optimizer trajectory, not just the params: fresh Adam
        # moments at a converged iterate cause a large transient excursion.
        # A live in-process state (a second run() call on the same driver)
        # takes precedence over checkpoint leaves.
        if getattr(self, "_opt_state", None) is None:
            opt_state = self.optimizer.init(self.params)
            opt_state, restored = ckpt.restore_opt_state(
                opt_state, getattr(self, "_opt_leaves", None)
            )
            if restored:
                print("resumed optimizer state from checkpoint")
            self._opt_state = opt_state
        self._opt_leaves = None
        i_epoch = len(self.results["loss"])

        while i_epoch < self.n_epoch:
            self.params, self._opt_state, e, sz, s2, fid, gnorm = self._step(
                self.params, self._opt_state
            )
            e, sz, s2, fid, gnorm = map(float, (e, sz, s2, fid, gnorm))
            self.results["loss"].append(e)
            self.results["Sz"].append(sz)
            self.results["S^2"].append(s2)
            self.results["fidelity"].append(fid)
            self.metrics.log(
                iter=len(self.results["loss"]),
                loss=e,
                norm=gnorm,
                fidelity=fid,
                Sz=sz,
                S_square=s2,
            )
            if self.plot and self.ground_state_energy is not None:
                plot_energy_fidelity(
                    self.img_filepath,
                    self.results["loss"],
                    self.results["fidelity"],
                    self.ground_state_energy,
                    label="HVA",
                )
            if (i_epoch + 1) % self.checkpoint_every == 0:
                self.save_model()
            i_epoch += 1
            if self.early_stop and self.threshold and gnorm < self.threshold:
                break

        self.save_model()
        return self.results

    # -- persistence ------------------------------------------------------------------

    def save_model(self):
        ckpt.save_model(
            self.model_filepath,
            {k: np.asarray(v) for k, v in self.params.items()},
            meta={"reps": self.reps, "n_qubits": self.n_qubits},
            opt_state=getattr(self, "_opt_state", None),
        )
        ckpt.save_results(self.result_filepath, self.results)

    def load_model(self):
        if not os.path.exists(ckpt.resolve(self.model_filepath)):
            raise ValueError(f"Please check if the file {self.model_filepath} exists!")
        if not os.path.exists(ckpt.resolve(self.result_filepath)):
            raise ValueError(f"Please check if the file {self.result_filepath} exists!")
        params, _, opt_leaves = ckpt.load_model(self.model_filepath)
        rdt = real_dtype(self.dtype)
        self.params = {k: jnp.asarray(v, dtype=rdt) for k, v in params.items()}
        self._opt_leaves = opt_leaves
        self._opt_state = None  # loaded leaves supersede any live state
        self.results = ckpt.load_results(self.result_filepath)


if __name__ == "__main__":
    # reference __main__ config (/root/reference/models/hva.py:361-380)
    vqe = HVA(
        n_epoch=1000,
        reps=10,
        lr=1e-2,
        threshold=1e-2,
        x_dimension=2,
        y_dimension=2,
        n_electrons=4,
        n_spin_up=2,
        n_spin_down=2,
        tunneling=1,
        coulomb=6,
        periodic=True,
        spinless=False,
        particle_hole_symmetry=False,
        load_model=False,
    )
    vqe.run()
