"""ADAPT-VQE driver: adaptive ansatz growth with batched pool screening.

TPU-native rebuild of ``/root/reference/models/adapt_vqe.py`` (class ADAPT
:124) and its degenerate-subspace variant ``adapt_vqe_for_3x3.py``.

Key redesigns versus the reference:

* **Pool screening without the giant eval circuit.**  The reference appends
  the ENTIRE pool to the circuit at angles e~0 and backprops once
  (``adapt_vqe.py:306-314``).  At zero angle that gradient equals the
  commutator expectation ``dE/de_k = 2 Im <w | G_k | psi_k>`` with
  ``w = U_FT^dag H U_FT |psi_k>``, so we evaluate it directly as ONE batched
  matrix-free pass over the packed pool (:class:`PackedPool`) -- no O(|pool|)
  circuit suffix, no autodiff graph over it.
* **One jitted train step per epoch.**  The reference instantiates two
  QNodes per iteration (state probe + train) with explicit GPU-memory
  hygiene between them (``adapt_vqe.py:404-432``); here a single fused step
  returns (energy, Sz, S^2, fidelity, grads) and jit purity makes the
  memory management moot.
* **Serializable ansatz.**  Selected operators are stored as POOL INDICES
  (the reference pickles ``functools.partial`` gate closures,
  ``adapt_vqe.py:144,269-280`` -- flagged in SURVEY.md section 5.4).

The ansatz acts in momentum space BEFORE the Givens network Fourier-
transforms to real space, exactly like the reference circuit
(``adapt_vqe.py:325-354``).
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..engine.circuits import apply_givens_network, apply_givens_network_adjoint
from ..engine.expectation import PackedPool
from ..engine.gates import generator_rotation
from ..grad.adjoint import adjoint_apply, expectation_value, givens_network_ops
from ..engine.state import basis_state, from_reim, real_dtype, to_reim_host, fidelity as state_fidelity, subspace_fidelity
from ..io import checkpoint as ckpt
from ..io.metrics import MetricsLogger, plot_energy_iterations
from ..ops.jw import jordan_wigner
from ..ops.pool import hubbard_interaction_pool_simplified
from .base import HubbardProblem, default_dtype


class ADAPT:
    def __init__(
        self,
        n_epoch: int,
        threshold1: float,
        threshold2: float,
        x_dimension: int,
        y_dimension: int,
        n_electrons: int,
        n_spin_up: int,
        n_spin_down: int,
        tunneling: float,
        coulomb: float,
        periodic: bool = True,
        spinless: bool = False,
        particle_hole_symmetry: bool = False,
        load_model: bool = False,
        ratio: float = 0.1,
        lr_scale: float = 0.05,
        max_inner_iterations: int = 10000,
        dtype=None,
        degenerate_subspace: int = 0,
        results_root: str = "./results",
        plot: bool = True,
        log_metrics: bool = True,
        pool=None,
        ground_truth: bool = True,
        adjoint_threshold: Optional[int] = None,
        circuit_mode: str = "auto",
        program_salt: float = 0.0,
        mesh_devices: int = 1,
    ):
        self.n_epoch = n_epoch
        self.threshold1 = threshold1
        self.threshold2 = threshold2
        self.ratio = ratio  # adapt_vqe.py:155
        self.lr_scale = lr_scale
        self.max_inner_iterations = max_inner_iterations
        self.plot = plot
        self.dtype = dtype or default_dtype()
        # adjoint-mode crossover (the reference switches backends at 20
        # qubits, adapt_vqe.py:299-304): at/above it, gradients come from the
        # O(1)-memory reverse gate replay instead of backprop.  Default is
        # platform-aware: on CPU the adjoint gradient is measured 3-4x faster
        # at EVERY size (the backprop pass is dominated by statevector
        # residual traffic), so it is always on; off-CPU the scan/split
        # lowerings have their own adjoint reverse and keep the reference's
        # crossover.
        if adjoint_threshold is None:
            try:
                platform = jax.devices()[0].platform
            except Exception:
                platform = "cpu"
            adjoint_threshold = 0 if platform == "cpu" else 20
        self.adjoint_threshold = adjoint_threshold
        # circuit lowering: "split" (separately jitted single-scan stages +
        # adjoint reverse scan) is THE path -- fastest measured at every
        # size (0.6/8.6/1286 ms/iter at 8/12/18 qubits vs 1.8/31/2640
        # unrolled), compiles 5-10x faster, and its constant-size programs
        # are the only form remote TPU compile services digest.  "unrolled"
        # (straight-line HLO, backprop/adjoint by n) is kept ONLY as the
        # independent cross-check lowering (tests/test_split_mode.py pits
        # the two against each other); the former "compiled" one-scan mode
        # was removed in round 2 (VERDICT #8) -- split supersedes it
        # everywhere.
        if circuit_mode == "auto":
            circuit_mode = "split"
        if circuit_mode not in ("split", "unrolled"):
            raise ValueError(
                f"circuit_mode={circuit_mode!r}: use 'split' (default) or "
                "'unrolled' (cross-check lowering)"
            )
        self.circuit_mode = circuit_mode
        # a tiny static Z-rotation appended to compiled programs; changing it
        # changes the program hash, which evicts cached-failure entries in
        # flaky remote compile services (used by bench retries)
        self.program_salt = float(program_salt)
        # multi-chip training: amplitude-shard the statevector over a device
        # mesh (steps AND pool screening run sharded; the capability the
        # reference delegates to one CUDA GPU, adapt_vqe.py:299-304)
        self.mesh_devices = int(mesh_devices)

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

        # pool (adapt_vqe.py:142-144)
        self.fermion_pool = (
            pool
            if pool is not None
            else hubbard_interaction_pool_simplified(x_dimension, y_dimension)
        )
        self.qubit_pool = [jordan_wigner(g) for g in self.fermion_pool]
        self.pool_rot = [g.rotation_terms() for g in self.qubit_pool]
        self.packed_pool = PackedPool(self.qubit_pool, self.n_qubits)

        # k-space initial state: occupied lowest momentum modes
        # (adapt_vqe.py:328-329); built INSIDE the jitted circuit so no
        # complex constant crosses the jit ABI
        self._occupied_modes = tuple(p.spin_up_indices + p.spin_down_indices)

        # exact ground truth
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

        tag = p.tag("ADAPT")
        self.img_filepath = f"./images/{tag}.png"
        self.result_filepath = os.path.join(results_root, "vqe_results", tag + ".json")
        self.model_filepath = os.path.join(results_root, "saved_model", tag + ".npz")
        self.metrics = MetricsLogger(
            os.path.join(results_root, "vqe_results", tag + ".jsonl") if log_metrics else None
        )

        rdt = real_dtype(self.dtype)
        self._rdt = rdt
        if load_model:
            self.load_model()
        else:
            self.selected_indices: List[int] = []
            self.params_t = jnp.asarray(np.zeros(0, dtype=rdt))
            self.results = {
                "epoch loss": [],
                "iteration loss": [],
                "Sz": [],
                "S^2": [],
                "fidelity": [],
                "n_params": [],
                "selected operators": [],
            }

        self._screen_fn = self._build_screen()

    # -- circuit pieces ----------------------------------------------------------

    def _ansatz_k(self, thetas, indices) -> jnp.ndarray:
        """k-space ansatz: exp(-i theta_i G_i) over the selected pool ops."""
        psi = basis_state(self.n_qubits, self._occupied_modes, dtype=self.dtype)
        for slot, idx in enumerate(indices):
            psi = generator_rotation(psi, self.n_qubits, self.pool_rot[idx], thetas[slot])
        return psi

    def _to_real(self, psi_k) -> jnp.ndarray:
        return apply_givens_network(
            psi_k, self.n_qubits, self.problem.diagonal, self.problem.decomposition
        )

    def state(self, thetas=None) -> jnp.ndarray:
        """Real-space ansatz state (reference mode='state')."""
        thetas = self.params_t if thetas is None else thetas
        return self._to_real(self._ansatz_k(thetas, self.selected_indices))

    # -- operator selection -------------------------------------------------------

    def _build_screen(self):
        p = self.problem

        def screen(psi_k):
            psi_r = self._to_real(psi_k)
            w_r = p.observables["H"].apply(psi_r)
            w_k = apply_givens_network_adjoint(
                w_r, self.n_qubits, p.diagonal, p.decomposition
            )
            return self.packed_pool.screen(psi_k, w_k)

        return jax.jit(screen)

    def _screen_for(self, indices: tuple):
        """Jitted end-to-end screening fn(thetas) for one ansatz shape.

        The whole pipeline (k-space ansatz, FT network, H apply, inverse
        network, batched pool pass) is ONE program -- no eager per-gate
        dispatch, which a remote TPU backend would compile one primitive
        at a time.
        """
        if not hasattr(self, "_screen_cache"):
            self._screen_cache = {}
        if indices in self._screen_cache:
            return self._screen_cache[indices]
        p = self.problem

        if self.mesh_devices > 1:
            from ..parallel import amplitude_mesh
            from ..parallel.sharded_adapt import build_sharded_screen_fn

            mesh = amplitude_mesh(self.mesh_devices)
            with mesh:
                fn = build_sharded_screen_fn(
                    p, self.pool_rot, list(indices), self.packed_pool, mesh,
                    dtype=self.dtype,
                )
            self._screen_cache[indices] = fn
            return fn

        if self.circuit_mode == "split":
            from ..engine.compiled import CompiledCircuit, givens_network_static_ops

            ansatz = CompiledCircuit(
                [("rot", tuple(self.pool_rot[i]), slot) for slot, i in enumerate(indices)],
                self.n_qubits,
            )
            net_ops, gphase = givens_network_static_ops(
                self.n_qubits, p.diagonal, p.decomposition
            )
            net = CompiledCircuit(net_ops, self.n_qubits, global_phase=gphase)
            empty = jnp.asarray(np.zeros(0, dtype=self._rdt))

            # each stage its own (small) compilation
            j_ans = jax.jit(
                lambda th: ansatz.apply(
                    basis_state(self.n_qubits, self._occupied_modes, dtype=self.dtype),
                    th,
                )
            )
            j_net = jax.jit(lambda psi: net.apply(psi, empty))
            j_h = jax.jit(p.observables["H"].apply_scan)
            j_netinv = jax.jit(lambda w: net.apply_inverse(w, empty))
            j_screen = jax.jit(self.packed_pool.screen_scan)

            def fn(thetas):
                psi_k = j_ans(thetas)
                w_k = j_netinv(j_h(j_net(psi_k)))
                return j_screen(psi_k, w_k)

            self._screen_cache[indices] = fn
            return fn

        else:

            def fn(thetas):
                psi_k = self._ansatz_k(thetas, indices)
                psi_r = self._to_real(psi_k)
                w_r = p.observables["H"].apply(psi_r)
                w_k = apply_givens_network_adjoint(
                    w_r, self.n_qubits, p.diagonal, p.decomposition
                )
                return self.packed_pool.screen(psi_k, w_k)

        jitted = jax.jit(fn)
        self._screen_cache[indices] = jitted
        return jitted

    def select_operator(self):
        """Batched pool-gradient screening (adapt_vqe.py:297-323).

        Returns (selected_indices, max_grads) with the reference's selection
        rule: |g| >= max(ratio * g_max) AND |g| >= threshold1, sorted by
        descending |g|.
        """
        fn = self._screen_for(tuple(self.selected_indices))
        grads = np.abs(np.asarray(fn(self.params_t)))
        max_grad = grads.max() if grads.size else 0.0
        # membership by the RAW values (reference rule, adapt_vqe.py:312-317)
        mask = (grads >= max_grad * self.ratio) & (grads >= self.threshold1)
        chosen = np.flatnonzero(mask)
        # stable order WITHIN the selected set: descending rounded |g|, ties
        # broken by pool index -- symmetric lattices produce EXACTLY
        # degenerate pool gradients, and raw argsort would order them by
        # 1e-15 float noise (different lowering/device -> different ansatz
        # order)
        order = chosen[np.lexsort((chosen, -np.round(grads[chosen], 10)))]
        return [int(i) for i in order], [float(grads[i]) for i in order]

    # -- training ------------------------------------------------------------------

    def _build_step_split(self, indices, optimizer):
        """Step composed from SEPARATELY jitted small programs.

        The remote TPU compile service in this environment rejects
        compilations past ~100 s; a monolithic value_and_grad step (4-5
        scans) exceeds that, but each stage alone (one scan) compiles in
        seconds.  Cost: a few extra dispatches per iteration.  Gradients
        come from the explicit adjoint reverse scan (O(1) memory).
        """
        from ..engine.compiled import (
            CompiledCircuit,
            givens_network_static_ops,
            run_rot_adjoint,
        )

        obs = self.problem.observables
        gs_reim = self._gs_reim
        p = self.problem
        ops = [("rot", tuple(self.pool_rot[i]), slot) for slot, i in enumerate(indices)]
        net_ops, gphase = givens_network_static_ops(
            self.n_qubits, p.diagonal, p.decomposition
        )
        if self.program_salt:
            net_ops = net_ops + [("rot", ((0, 1, self.program_salt),), -1)]

        # ALL stage boundaries exchange stacked (2, 2^n) REAL arrays: the
        # axon backend cannot consume another program's complex output
        # (complex-free jit ABI, see engine.state)
        from ..engine.state import to_reim

        dt = self.dtype

        # QSFH_SPLIT_TWO_SCAN=1 keeps the ansatz and the Givens network as
        # TWO scans inside each stage instead of one merged scan -- same
        # math, a program shape observed to compile on remote TPU services
        # that reject the longer merged scan
        two_scan = os.environ.get("QSFH_SPLIT_TWO_SCAN", "0") == "1" and ops
        if two_scan:
            ans_cc = CompiledCircuit(ops, self.n_qubits)
            net_cc = CompiledCircuit(net_ops, self.n_qubits, global_phase=gphase)
            assert len(ans_cc.segments) == 1 and len(net_cc.segments) == 1
            ans_seg = ans_cc.segments[0]
            net_seg = net_cc.segments[0]

            def fwd_raw(th):
                psi0 = basis_state(self.n_qubits, self._occupied_modes, dtype=dt)
                return to_reim(net_cc.apply(ans_cc.apply(psi0, th), th))

            def fwd_from_raw(psi0_r, th):
                psi0 = from_reim(psi0_r, dt)
                return to_reim(net_cc.apply(ans_cc.apply(psi0, th), th))

            def adjoint_raw(psi_r, lam_r, th):
                psi_m, lam_m, _ = run_rot_adjoint(
                    net_seg, from_reim(psi_r, dt), from_reim(lam_r, dt), th,
                    self.n_qubits,
                )
                return run_rot_adjoint(ans_seg, psi_m, lam_m, th, self.n_qubits)[2]

        else:
            cc = CompiledCircuit(ops + net_ops, self.n_qubits, global_phase=gphase)
            assert len(cc.segments) == 1 and cc.segments[0].kind == "rot"
            seg = cc.segments[0]

            def fwd_raw(th):
                psi0 = basis_state(self.n_qubits, self._occupied_modes, dtype=dt)
                return to_reim(cc.apply(psi0, th))

            def fwd_from_raw(psi0_r, th):
                psi0 = from_reim(psi0_r, dt)
                return to_reim(cc.apply(psi0, th))

            def adjoint_raw(psi_r, lam_r, th):
                return run_rot_adjoint(
                    seg, from_reim(psi_r, dt), from_reim(lam_r, dt), th,
                    self.n_qubits,
                )[2]

        # the fwd/adjoint programs are salted through net_ops above, but
        # energy/cotangent/metrics/update used to have FIXED program hashes:
        # one rejection in a sick service window poisoned them in the remote
        # failure cache forever.  A numerically invisible constant (~1e-35)
        # folded into each program gives every stage a fresh hash per salt.
        _eps = float(self.program_salt) * 1e-30

        def energy_raw(psi_r):
            return obs["H"].expectation_scan(from_reim(psi_r, dt)) + _eps

        def cotangent_raw(psi_r):
            return to_reim(2.0 * obs["H"].apply_scan(from_reim(psi_r, dt))) + _eps

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
                fid = jnp.zeros((), dtype=self._rdt)
            return sz + _eps, s2, fid

        def update_fn(thetas, grads, opt_state):
            gnorm = jnp.linalg.norm(grads) + _eps
            updates, opt_state = optimizer.update(grads, opt_state)
            return optax.apply_updates(thetas, updates), opt_state, gnorm

        fwd = jax.jit(fwd_raw)
        energy_fn = jax.jit(energy_raw)
        cotangent_fn = jax.jit(cotangent_raw)
        adjoint_fn = jax.jit(adjoint_raw)
        metrics_jit = jax.jit(metrics_fn)
        update_jit = jax.jit(update_fn)

        def step(thetas, opt_state):
            psi_r = fwd(thetas)
            energy = energy_fn(psi_r)
            lam_r = cotangent_fn(psi_r)
            grads = adjoint_fn(psi_r, lam_r, thetas)
            sz, s2, fid = metrics_jit(psi_r)
            new_thetas, opt_state, gnorm = update_jit(thetas, grads, opt_state)
            return new_thetas, opt_state, energy, sz, s2, fid, gnorm

        # raw (unjitted) stages for granular cache warming (bench --warm-stages):
        # each can be re-jitted fresh to bypass jax's in-process failure cache
        # merged stages: every tunneled program execution carries a fixed
        # scheduling overhead (~0.5 s measured between stage-sum and
        # chunk-drain time at the flagship size), so fewer, fatter programs
        # win.  cot_e folds the energy into the cotangent pass (E =
        # 0.5*Re<psi|2H psi> -- drops the separate energy H-scan entirely);
        # adj_upd chains the optimizer update onto the adjoint sweep.
        def cot_e_raw(psi_r):
            psi = from_reim(psi_r, dt)
            lam = 2.0 * obs["H"].apply_scan(psi)
            lam_r = to_reim(lam) + _eps
            e = 0.5 * jnp.real(jnp.vdot(psi, lam)) + _eps
            return lam_r, e

        def adj_upd_raw(psi_r, lam_r, thetas, opt_state):
            grads = adjoint_raw(psi_r, lam_r, thetas)
            return update_fn(thetas, grads, opt_state)

        def energy_df_raw(psi_r):
            # double-float Rayleigh quotient of the f32 state: on-chip
            # energies trustworthy to the state's own direction error
            # (engine/dfloat.py; VERDICT r3 missing #1).  The salt keeps
            # the program hash fresh like every other stage.
            from ..engine.dfloat import expectation_norm_df

            return expectation_norm_df(
                psi_r + jnp.asarray(_eps, psi_r.dtype),
                self.n_qubits,
                obs["H"].op,
            )

        step.raw_stages = {
            "fwd": fwd_raw,
            # fwd from a host-fed initial state: tracing the basis one-hot
            # constant costs the remote compile service ~2 min at 18q
            # (benchmarks/tpu_bisect_basis.jsonl) -- benchmarks and chained
            # restarts feed |psi0> as a (2, 2^n) input instead
            "fwd_from": fwd_from_raw,
            "energy": energy_raw,
            "cotangent": cotangent_raw,
            "adjoint": adjoint_raw,
            "metrics": metrics_fn,
            "update": update_fn,
            "cot_e": cot_e_raw,
            "adj_upd": adj_upd_raw,
            "energy_df": energy_df_raw,
        }
        return step

    def _build_step(self, indices, optimizer):
        obs = self.problem.observables
        gs_reim = self._gs_reim
        p = self.problem

        if self.mesh_devices > 1:
            from ..parallel import amplitude_mesh
            from ..parallel.mesh import replicated
            from ..parallel.sharded_adapt import build_sharded_adapt_train_step

            mesh = amplitude_mesh(self.mesh_devices)
            step, _, _ = build_sharded_adapt_train_step(
                p,
                self.pool_rot,
                list(indices),
                mesh,
                dtype=self.dtype,
                gs_reim=[jnp.asarray(g) for g in gs_reim],
                optimizer=optimizer,  # the driver's dynamic-lr Adam
            )
            self.params_t = jax.device_put(self.params_t, replicated(mesh))
            return step

        if self.circuit_mode == "split":
            return self._build_step_split(indices, optimizer)

        # "unrolled" cross-check lowering below (straight-line HLO)
        if self.n_qubits >= self.adjoint_threshold:
            ops = tuple(
                [("rot", tuple(self.pool_rot[i]), slot) for slot, i in enumerate(indices)]
                + givens_network_ops(self.n_qubits, p.diagonal, p.decomposition)
            )

            def loss_fn(thetas):
                psi0 = basis_state(self.n_qubits, self._occupied_modes, dtype=self.dtype)
                psi = adjoint_apply(self.n_qubits, ops, psi0, thetas)
                return expectation_value(obs["H"], psi), psi

        else:

            def loss_fn(thetas):
                psi = self._to_real(self._ansatz_k(thetas, indices))
                return obs["H"].expectation(psi), psi

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def step(thetas, opt_state):
            (energy, psi), grads = grad_fn(thetas)
            sz = obs["Sz"].expectation(psi)
            s2 = obs["S^2"].expectation(psi)
            gs_states = [from_reim(g, psi.dtype) for g in gs_reim]
            if len(gs_states) > 1:
                fid = subspace_fidelity(psi, gs_states)
            elif len(gs_states) == 1:
                fid = state_fidelity(psi, gs_states[0])
            else:
                fid = jnp.zeros((), dtype=energy.dtype)
            gnorm = jnp.linalg.norm(grads)
            updates, opt_state = optimizer.update(grads, opt_state)
            thetas = optax.apply_updates(thetas, updates)
            return thetas, opt_state, energy, sz, s2, fid, gnorm

        return jax.jit(step)

    def get_ground_state_properties(self):
        """Print exact-ground-state observables (adapt_vqe.py:249-267).

        The reference prints only energy and particle number (the Sz/S^2
        sparse-operator evaluations are commented out there); here they are
        actually computed from the cached ED state(s)."""
        print("ground state energy: ", self.ground_state_energy)
        print("particle number: ", self.problem.n_electrons)
        from ..engine.state import from_reim

        obs = self.problem.observables
        reims = getattr(self, "_gs_reim", None) or []
        for i, g in enumerate(reims):
            psi = from_reim(jnp.asarray(g), self.dtype)
            tag = f" [{i}]" if len(reims) > 1 else ""
            print(f"Sz{tag}: ", round(float(obs["Sz"].expectation(psi)), 6))
            print(f"S^2{tag}: ", round(float(obs["S^2"].expectation(psi)), 6))
        print("")

    def run(self):
        from ..utils.profiling import PhaseTimer

        timer = PhaseTimer()
        self.timer = timer
        if self.ground_state_energy is not None:
            print("ground state energy: ", self.ground_state_energy)
        i_epoch = len(self.results["epoch loss"])

        while i_epoch < self.n_epoch:
            with timer.phase("screening"):
                new_indices, max_grads = self.select_operator()
            if not new_indices:
                print("\nconvergence criterion has satisfied, break the loop!")
                break

            self.selected_indices += new_indices
            # host-side concat: an eager jnp.concatenate dispatches a
            # fixed-hash program per epoch (poisonable; see state.real_dtype)
            self.params_t = jnp.asarray(
                np.concatenate(
                    [np.asarray(self.params_t),
                     np.zeros(len(new_indices), dtype=self._rdt)]
                )
            )
            self.results["selected operators"] += [
                repr(self.fermion_pool[i]).replace("\n", " ") for i in new_indices
            ]
            self.results["n_params"].append(len(self.selected_indices))

            # dynamic learning rate (adapt_vqe.py:392)
            n_new = len(new_indices)
            lr = float(np.linalg.norm(max_grads) / np.sqrt(n_new) * self.lr_scale)
            optimizer = optax.adam(lr)
            opt_state = optimizer.init(self.params_t)
            print(f"epoch {i_epoch + 1}: selected {n_new} operators, lr = {lr:.6f}")

            with timer.phase("step build+compile"):
                step = self._build_step(tuple(self.selected_indices), optimizer)
            inner = 0
            while inner < self.max_inner_iterations:
                with timer.phase("inner iteration"):
                    self.params_t, opt_state, e, sz, s2, fid, gnorm = step(
                        self.params_t, opt_state
                    )
                    # the host conversion is the sync point (dispatch is
                    # async); keep it inside the phase for honest timing
                    e, sz, s2, fid, gnorm = map(float, (e, sz, s2, fid, gnorm))
                self.results["iteration loss"].append(e)
                self.results["Sz"].append(sz)
                self.results["S^2"].append(s2)
                self.results["fidelity"].append(fid)
                self.metrics.log(
                    iter=len(self.results["iteration loss"]),
                    loss=e,
                    norm=gnorm,
                    fidelity=fid,
                    Sz=sz,
                    S_square=s2,
                )
                inner += 1
                if gnorm < self.threshold2:
                    break

            self.results["epoch loss"].append(self.results["iteration loss"][-1])
            i_epoch += 1
            with timer.phase("checkpoint"):
                self.save_model()
            if self.plot and self.ground_state_energy is not None:
                plot_energy_iterations(
                    self.img_filepath,
                    self.results["iteration loss"],
                    self.results["epoch loss"],
                    self.ground_state_energy,
                )

        print(timer.report())
        return self.results

    # -- persistence ------------------------------------------------------------------

    def save_model(self):
        ckpt.save_model(
            self.model_filepath,
            {
                "t": np.asarray(self.params_t),
                "selected_indices": np.asarray(self.selected_indices, dtype=np.int64),
            },
            meta={"n_qubits": self.n_qubits, "pool_size": len(self.fermion_pool)},
        )
        ckpt.save_results(self.result_filepath, self.results)

    def load_model(self):
        if not os.path.exists(ckpt.resolve(self.model_filepath)):
            raise ValueError(f"Please check if the file {self.model_filepath} exists!")
        if not os.path.exists(ckpt.resolve(self.result_filepath)):
            raise ValueError(f"Please check if the file {self.result_filepath} exists!")
        params, meta, _ = ckpt.load_model(self.model_filepath)
        # a checkpoint whose pool is SMALLER is resumable when the current
        # pool extends it (prefix contract, e.g.
        # hubbard_interaction_pool_extended): the recorded indices stay
        # valid; a LARGER recorded pool has indices this pool can't express
        ckpt_pool = meta.get("pool_size") if meta else None
        if ckpt_pool is not None and ckpt_pool > len(self.fermion_pool):
            raise ValueError(
                f"checkpoint was written with a larger pool "
                f"({ckpt_pool} ops vs {len(self.fermion_pool)}); resume "
                f"with a pool that extends the recorded one"
            )
        self.params_t = jnp.asarray(params["t"], dtype=self._rdt)
        self.selected_indices = [int(i) for i in params["selected_indices"]]
        if self.selected_indices and max(self.selected_indices) >= len(self.fermion_pool):
            raise ValueError(
                "checkpoint selects pool indices beyond the current pool"
            )
        self.results = ckpt.load_results(self.result_filepath)


if __name__ == "__main__":
    # reference __main__ config (/root/reference/models/adapt_vqe.py:470-485)
    vqe = ADAPT(
        n_epoch=100,
        threshold1=1e-2,
        threshold2=1e-2,
        x_dimension=2,
        y_dimension=4,
        n_electrons=8,
        n_spin_up=4,
        n_spin_down=4,
        tunneling=1,
        coulomb=2,
        load_model=False,
    )
    vqe.run()
