"""iQCC driver: iterative qubit-coupled-cluster with Hamiltonian dressing.

TPU-native rebuild of ``/root/reference/models/iqcc.py`` (molecular) and
``iqcc_hubbard.py`` (lattice) -- one class serves both since they differ only
in the Hamiltonian source and ground-truth energy.

Redesigns versus the reference:

* The RY/RZ product-state ansatz is built as an O(2^n) chain of Kronecker
  products of per-qubit 2-spinors -- not 2n sequential full-statevector gate
  passes (``iqcc.py:54-56``).
* DIS screening reuses the batched commutator pass (:class:`PackedPool`):
  d<H>/dtau_k at tau=0 equals Im <H psi | P_k | psi>, evaluated for ALL
  candidate generators in one fused sweep instead of the reference's
  pool-append + backprop QNode (``iqcc.py:114-120``).
* Hamiltonian dressing runs on the packed (x, z, c) arrays -- vectorized
  XOR/popcount products with lexsort merging (:mod:`qsfh_tpu.ops.dressing`)
  instead of Python dict algebra, plus an optional ``max_terms``
  magnitude cap (SURVEY.md hard part (b)).
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..engine.expectation import Observable, PackedPool
from ..engine.gates import pauli_rotation
from ..engine.state import real_dtype
from ..io import checkpoint as ckpt
from ..io.metrics import MetricsLogger, plot_energy_iterations
from ..ops.dressing import dis_generators, dress_hamiltonian
from ..ops.fermion import FermionOperator
from ..ops.jw import jordan_wigner
from ..ops.pauli import PauliSum
from .base import default_dtype


def product_state(thetas, phis, n_qubits: int, dtype) -> jnp.ndarray:
    """|psi> = prod_i RZ(phi_i) RY(theta_i) |0>  as one Kronecker chain.

    PennyLane conventions: RY(t)|0> = cos(t/2)|0> + sin(t/2)|1>,
    RZ(p) = diag(e^{-ip/2}, e^{ip/2}).  Qubit 0 is the most significant
    index bit (engine convention, qsfh_tpu.engine.state).
    """
    half_t = thetas / 2
    half_p = phis / 2
    amp0 = jnp.cos(half_t) * jnp.exp(-1j * half_p)
    amp1 = jnp.sin(half_t) * jnp.exp(1j * half_p)
    spinors = jnp.stack([amp0, amp1], axis=1).astype(dtype)  # (n, 2)
    psi = spinors[0]
    for i in range(1, n_qubits):
        psi = jnp.kron(psi, spinors[i])
    return psi


class IQCC:
    def __init__(
        self,
        hamiltonian,
        n_epoch: int,
        lr: float,
        threshold: float,
        n_qubits: Optional[int] = None,
        n_electrons: Optional[int] = None,
        ratio: float = 0.1,
        max_inner_iterations: int = 10000,
        inner_optimizer: str = "adam",
        max_terms: Optional[int] = None,
        compaction_eps: Optional[float] = None,
        dense_dressing: bool = False,
        ilc: bool = False,
        ilc_cap: int = 32,
        ilc_rounds: int = 2,
        ilc_min_gain: float = 1e-7,
        reference_energy: Optional[float] = None,
        ground_truth: bool = True,
        dtype=None,
        results_root: str = "./results",
        tag: str = "IQCC",
        plot: bool = True,
        log_metrics: bool = True,
        load_model: bool = False,
    ):
        """``hamiltonian``: FermionOperator (JW-mapped here) or PauliSum.

        ``reference_energy`` overrides the computed ground truth (molecular
        drivers pass the FCI energy, iqcc.py:187); otherwise with
        ``ground_truth=True`` the exact energy is found by full-space dense
        diagonalization on CPU, matching ``get_ground_state`` at
        iqcc_hubbard.py:57 (NO sector restriction).
        """
        if hasattr(hamiltonian, "get_molecular_hamiltonian"):
            # molecular variant (iqcc.py:34): accept a Molecule directly and
            # track against its FCI energy
            molecule = hamiltonian
            hamiltonian = molecule.get_molecular_hamiltonian()
            if n_electrons is None:
                n_electrons = molecule.n_electrons
            if reference_energy is None and molecule.fci_energy is not None:
                reference_energy = molecule.fci_energy
        if isinstance(hamiltonian, FermionOperator):
            qubit_h = jordan_wigner(hamiltonian)
        else:
            qubit_h = hamiltonian
        self.initial_hamiltonian = qubit_h
        self.current_hamiltonian = qubit_h.copy()
        self.n_qubits = n_qubits or qubit_h.n_qubits()
        self.n_electrons = (
            n_electrons if n_electrons is not None else self.n_qubits // 2
        )
        self.n_epoch = n_epoch
        self.lr = lr
        self.threshold = threshold
        self.ratio = ratio
        self.max_inner_iterations = max_inner_iterations
        # "adam" (reference parity, iqcc.py:158) or "lbfgs": the epoch
        # subproblem is smooth with an exact dense/packed energy, and
        # L-BFGS-with-linesearch closes it in ~10x fewer iterations than
        # the reference's fixed-lr Adam at 250-generator selections
        if inner_optimizer not in ("adam", "lbfgs"):
            raise ValueError("inner_optimizer must be 'adam' or 'lbfgs'")
        self.inner_optimizer = inner_optimizer
        self.max_terms = max_terms
        # per-epoch operator-norm budget for dropping small dressed terms
        # (ops/dressing.py compact); the cumulative bound is tracked in
        # self.compaction_bound and rigorously bounds the total eigenvalue
        # shift introduced by compaction across all epochs
        self.compaction_eps = compaction_eps
        self.compaction_bound = 0.0
        # EXACT dense-matrix dressing (ops/dense_dressing.py): the dressed
        # H lives as a 2^n x 2^n matrix (two ZGEMMs per epoch, zero
        # truncation) and the PauliSum is re-derived per epoch for DIS
        # selection only.  The answer to symbolic term explosion at 12-14
        # qubits (uncapped 2x3 reaches 586k terms after TWO epochs).
        self.dense_dressing = bool(dense_dressing)
        if self.dense_dressing and (n_qubits or qubit_h.n_qubits()) > 14:
            raise ValueError("dense_dressing is a <=14-qubit backend (4^n memory)")
        # iQCC-ILC boost epochs (ops/ilc.py): after each standard epoch's
        # fold, diagonalize H in span{|0>, P_k|0>} over a mutually
        # anticommuting DIS subset and fold the involutory-combination
        # unitary exactly.  Second-order couplings keep these steps
        # productive at the first-order plateau the round-4 2x3 campaign
        # measured (dense.json plateau_diagnostic).  Dense backend only.
        self.ilc = bool(ilc)
        if self.ilc and not self.dense_dressing:
            raise ValueError("ilc=True requires dense_dressing=True")
        self.ilc_cap = int(ilc_cap)
        self.ilc_rounds = int(ilc_rounds)
        self.ilc_min_gain = float(ilc_min_gain)
        self._dense_h = None
        self._dense_nnz = None
        self.plot = plot
        self.dtype = dtype or default_dtype()
        rdt = real_dtype(self.dtype)
        self._rdt = rdt

        if reference_energy is not None:
            self.ground_state_energy = float(reference_energy)
        elif ground_truth:
            self.ground_state_energy = self._dense_ground_energy(qubit_h)
        else:
            self.ground_state_energy = None

        self.img_filepath = f"./images/{tag}.png"
        self.result_filepath = os.path.join(results_root, "vqe_results", tag + ".json")
        self.model_filepath = os.path.join(results_root, "saved_model", tag + ".npz")
        self.metrics = MetricsLogger(
            os.path.join(results_root, "vqe_results", tag + ".jsonl")
            if log_metrics
            else None
        )

        if load_model:
            self.load_model()
        else:
            # theta init pi on the first n_electrons wires (iqcc.py:39)
            self.params = {
                "theta": jnp.asarray(
                    [np.pi] * self.n_electrons
                    + [0.0] * (self.n_qubits - self.n_electrons),
                    dtype=rdt,
                ),
                "phi": jnp.asarray(np.zeros(self.n_qubits, dtype=rdt)),
                "tau": jnp.asarray(np.zeros(0, dtype=rdt)),
            }
            self.loss_history = {"iteration": [], "epoch": []}
            self.selected_ops: List[str] = []  # dressing audit trail

    def _dense_ground_energy(self, qubit_h: PauliSum) -> float:
        from ..utils.dense import paulisum_to_dense

        if self.n_qubits > 14:
            raise ValueError(
                "dense full-space ground truth limited to 14 qubits; pass "
                "reference_energy or ground_truth=False"
            )
        H = paulisum_to_dense(qubit_h, self.n_qubits)
        return float(np.linalg.eigvalsh(H)[0])

    # -- circuit -------------------------------------------------------------------

    def _state(self, params, selected):
        """Product state + selected exp(-i tau_k P_k / 2) rotations
        (iqcc.py:50-59; gates are exp(-i tau/2 P)).

        Above ~two dozen rotations the chain is lowered to ONE scan
        segment (engine/compiled.py) instead of unrolling K gates into the
        jaxpr: the dense 2x3 probe selects ~250 generators per epoch, and
        the unrolled value_and_grad program's XLA compile dominated the
        45-minute epochs of benchmarks/demo_iqcc_2x3_r4/probe_growth.log.
        (Below that, the unrolled form compiles faster than the scan.)
        """
        psi = product_state(params["theta"], params["phi"], self.n_qubits, self.dtype)
        if len(selected) >= 24:
            from ..engine.compiled import CompiledCircuit

            cc = CompiledCircuit(
                [("rot", ((x, z, 0.5),), k) for k, (x, z) in enumerate(selected)],
                self.n_qubits,
            )
            return cc.apply(psi, params["tau"])
        for k, (x, z) in enumerate(selected):
            psi = pauli_rotation(psi, self.n_qubits, x, z, params["tau"][k] / 2)
        return psi

    def state(self):
        return self._state(self.params, [])

    # -- operator selection -----------------------------------------------------------

    def select_operator(self, observable: Observable):
        """DIS screening: one batched commutator pass over all flip sets.

        Selection rule parity with iqcc.py:123-127: if g_max*ratio >
        threshold select {g > g_max*ratio}, else {g > threshold}.
        """
        if (
            self.dense_dressing
            and self._dense_h is not None
            and len(self.selected_ops) > 0
        ):
            # flip partition straight off the dense matrix: the PauliSum
            # view saturates toward 4^n terms under exact dressing, so
            # materializing it per epoch is the route that must die.
            # Undressed (epoch 1) keeps the symbolic route: the initial
            # H's construction order sets the reference tie-breaking,
            # and it is not recoverable from the matrix (dressed H IS
            # ascending-x ordered -- simplify/native merge lexsort).
            from ..ops.dense_dressing import dense_dis_generators

            dis, self._dense_nnz = dense_dis_generators(
                self._dense_h, self.n_qubits
            )
        else:
            dis = dis_generators(self.current_hamiltonian)
        if not dis:
            return [], [], []
        pool = PackedPool([0.5 * P for _, P in dis], self.n_qubits)

        def screen(theta, phi):
            psi = product_state(theta, phi, self.n_qubits, self.dtype)
            w = observable.apply_auto(psi)
            return pool.screen_scan(psi, w)

        grads = np.abs(np.asarray(jax.jit(screen)(self.params["theta"], self.params["phi"])))
        max_grad = grads.max()
        if max_grad * self.ratio > self.threshold:
            n_sel = int(np.sum(grads > max_grad * self.ratio))
        else:
            n_sel = int(np.sum(grads > self.threshold))
        order = np.argsort(grads)[::-1][:n_sel]
        gens = [dis[i][1] for i in order]
        labels = [dis[i][1].to_terms()[0][0] for i in order]
        return gens, labels, [float(grads[i]) for i in order]

    # -- training ------------------------------------------------------------------

    def _build_step(self, observable: Observable, selected_masks, optimizer,
                    style: str = "adam"):
        def loss_fn(params):
            psi = self._state(params, selected_masks)
            return observable.expectation_auto(psi)

        if style == "lbfgs":
            value_and_grad = optax.value_and_grad_from_state(loss_fn)

            def step(params, opt_state):
                energy, grads = value_and_grad(params, state=opt_state)
                gnorm = optax.global_norm(grads)
                updates, opt_state = optimizer.update(
                    grads, opt_state, params,
                    value=energy, grad=grads, value_fn=loss_fn,
                )
                params = optax.apply_updates(params, updates)
                return params, opt_state, energy, gnorm

            return jax.jit(step)

        grad_fn = jax.value_and_grad(loss_fn)

        def step(params, opt_state):
            energy, grads = grad_fn(params)
            gnorm = optax.global_norm(grads)
            updates, opt_state = optimizer.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, energy, gnorm

        return jax.jit(step)

    def run(self):
        if self.ground_state_energy is not None:
            print("ground state energy: ", self.ground_state_energy)

        i_epoch = len(self.loss_history["epoch"])
        if self.dense_dressing and self._dense_h is None:
            from ..ops.dense_dressing import paulisum_to_dense_fast

            self._dense_h = paulisum_to_dense_fast(
                self.current_hamiltonian, self.n_qubits
            )
        while i_epoch < self.n_epoch:
            if self.dense_dressing:
                from ..ops.dense_dressing import DenseObservable

                observable = DenseObservable(self._dense_h, self.n_qubits)
            else:
                observable = Observable(self.current_hamiltonian, self.n_qubits)
            gens, labels, max_grads = self.select_operator(observable)
            if not max_grads:
                print("\nconvergence criterion has satisfied, break the loop!")
                break
            print(f"=== Found operators: {labels}\n with gradients: {max_grads} ===")

            self.params["tau"] = jnp.asarray(np.zeros(len(gens), dtype=self._rdt))
            selected_masks = [(int(P.x[0]), int(P.z[0])) for P in gens]

            inner = 0

            def drive(optimizer, step, budget, stop_at_threshold=True):
                nonlocal inner
                opt_state = optimizer.init(self.params)
                while inner < budget:
                    self.params, opt_state, e, gnorm = step(
                        self.params, opt_state
                    )
                    e, gnorm = float(e), float(gnorm)
                    self.loss_history["iteration"].append(e)
                    self.metrics.log(
                        iter=len(self.loss_history["iteration"]), loss=e, norm=gnorm
                    )
                    inner += 1
                    if stop_at_threshold and gnorm < self.threshold:
                        break

            if self.inner_optimizer == "lbfgs":
                # Adam warmup first: the tau=0 epoch start sits near
                # high-symmetry stationary points (the 2x2 landscape has a
                # local minimum at E=+4 that traps exact line search;
                # Adam's momentum hops it), then L-BFGS closes the smooth
                # tail in ~10x fewer iterations than fixed-lr Adam
                warm_opt = optax.adam(self.lr)
                # stop_at_threshold=True: converged subproblems exit the
                # warmup early instead of burning the fixed budget; the
                # L-BFGS stage below still runs either way (ADVICE r4)
                drive(
                    warm_opt,
                    self._build_step(observable, selected_masks, warm_opt),
                    min(100, self.max_inner_iterations // 2),
                    stop_at_threshold=True,
                )
                lb = optax.lbfgs()
                drive(
                    lb,
                    self._build_step(
                        observable, selected_masks, lb, style="lbfgs"
                    ),
                    self.max_inner_iterations,
                )
            else:
                opt = optax.adam(self.lr)
                drive(
                    opt,
                    self._build_step(observable, selected_masks, opt),
                    self.max_inner_iterations,
                )

            self.loss_history["epoch"].append(self.loss_history["iteration"][-1])
            self.selected_ops += labels

            # fold the optimized rotations into the Hamiltonian and discard
            # the gates (iqcc.py:172-180)
            taus = np.asarray(self.params["tau"])
            if self.dense_dressing:
                from ..ops.dense_dressing import dress_dense

                # the dense matrix IS the dressed Hamiltonian (exact);
                # DIS selection reads it directly next epoch, and
                # current_hamiltonian keeps the last SMALL symbolic form
                # for observers that want a term view
                self._dense_h = dress_dense(
                    self._dense_h, gens, taus, self.n_qubits
                )
            else:
                self.current_hamiltonian, dropped, dweight = dress_hamiltonian(
                    self.current_hamiltonian, gens, taus,
                    max_terms=self.max_terms,
                    compaction_eps=self.compaction_eps,
                )
                if dropped:
                    self.compaction_bound += dweight
                    print(
                        f"compaction: dropped {dropped} smallest terms "
                        f"({len(self.current_hamiltonian)} kept), epoch bound "
                        f"{dweight:.3e}, cumulative eigenvalue-shift bound "
                        f"{self.compaction_bound:.3e}"
                    )
            if self.ilc:
                self._run_ilc_folds()
            i_epoch += 1
            n_terms = (
                self._dense_nnz
                if self.dense_dressing and self._dense_nnz is not None
                else len(self.current_hamiltonian)
            )
            print(
                f"epoch: {i_epoch}, total energy: {self.loss_history['epoch'][-1]}, "
                f"H terms: {n_terms}"
            )
            self.save_model()
            if self.plot and self.ground_state_energy is not None:
                plot_energy_iterations(
                    self.img_filepath,
                    self.loss_history["iteration"],
                    self.loss_history["epoch"],
                    self.ground_state_energy,
                    label="iqcc",
                )
        return self.loss_history

    def _run_ilc_folds(self):
        """Up to ``ilc_rounds`` ILC folds at the current QMF state; each
        re-derives the DIS from the (exactly) dressed matrix, so
        successive folds see fresh second-order structure.  The epoch
        energy entry is updated to the post-fold energy (the fold is a
        frame change, not a new variational state)."""
        from ..ops.dense_dressing import dense_dis_generators
        from ..ops.ilc import ilc_step_dense

        psi = np.asarray(
            product_state(
                self.params["theta"], self.params["phi"], self.n_qubits,
                np.complex128,
            )
        )
        for r in range(self.ilc_rounds):
            dis, self._dense_nnz = dense_dis_generators(
                self._dense_h, self.n_qubits
            )
            if not dis:
                break
            gens = [P for _, P in dis]
            Hd, e_pred, info = ilc_step_dense(
                self._dense_h, psi, gens, self.n_qubits, cap=self.ilc_cap
            )
            if info.get("gain", 0.0) < self.ilc_min_gain:
                break
            self._dense_h = Hd
            self.selected_ops.append(
                f"ILC[{info['selected']}] gain={info['gain']:.3e}"
            )
            print(
                f"ILC fold {r}: {info['selected']} anticommuting gens, "
                f"E {info['E0']:.6f} -> {e_pred:.6f} "
                f"(gain {info['gain']:.3e}, best single {info['best_single_gain']:.3e})"
            )
            if self.loss_history["epoch"]:
                self.loss_history["epoch"][-1] = float(e_pred)
            self.loss_history["iteration"].append(float(e_pred))
            self.metrics.log(
                iter=len(self.loss_history["iteration"]), loss=float(e_pred),
                norm=0.0, ilc=info["selected"],
            )

    # -- persistence ------------------------------------------------------------------

    def save_model(self):
        ckpt.save_model(
            self.model_filepath,
            {
                "theta": np.asarray(self.params["theta"]),
                "phi": np.asarray(self.params["phi"]),
                "tau": np.asarray(self.params["tau"]),
                "H_x": np.asarray(self.current_hamiltonian.x),
                "H_z": np.asarray(self.current_hamiltonian.z),
                "H_c": np.asarray(self.current_hamiltonian.c),
            },
            meta={
                "n_qubits": self.n_qubits,
                "selected_ops": self.selected_ops,
                "compaction_bound": self.compaction_bound,
                # when true, the .dense.npy sidecar is the dressed-H
                # authority and the npz's symbolic form is the UNDRESSED
                # initial H -- load_model must refuse to resume without it
                "dense_sidecar": bool(
                    self.dense_dressing and self._dense_h is not None
                ),
            },
        )
        if self.dense_dressing and self._dense_h is not None:
            # the dense matrix is the dressed-H authority; the npz keeps
            # only the (small) symbolic form.  complex128, 2^n square --
            # ~4.3 GB at 14q (268 MB at 12q), written atomically beside
            # the npz.
            dense_path = ckpt.resolve(self.model_filepath) + ".dense.npy"
            tmp = dense_path + ".tmp.npy"
            np.save(tmp, self._dense_h)
            os.replace(tmp, dense_path)
        ckpt.save_results(self.result_filepath, self.loss_history)

    def load_model(self):
        if not os.path.exists(ckpt.resolve(self.model_filepath)):
            raise ValueError(f"Please check if the file {self.model_filepath} exists!")
        params, meta, _ = ckpt.load_model(self.model_filepath)
        self.params = {
            "theta": jnp.asarray(params["theta"], dtype=self._rdt),
            "phi": jnp.asarray(params["phi"], dtype=self._rdt),
            "tau": jnp.asarray(params["tau"], dtype=self._rdt),
        }
        self.current_hamiltonian = PauliSum(params["H_x"], params["H_z"], params["H_c"])
        self.selected_ops = list(meta.get("selected_ops", []))
        self.compaction_bound = float(meta.get("compaction_bound", 0.0))
        self.loss_history = ckpt.load_results(self.result_filepath)
        if self.dense_dressing:
            dense_path = ckpt.resolve(self.model_filepath) + ".dense.npy"
            if os.path.exists(dense_path):
                self._dense_h = np.load(dense_path)
            elif meta.get("dense_sidecar"):
                # new-format checkpoint whose sidecar is lost: the npz's
                # symbolic H is the UNDRESSED initial Hamiltonian, so a
                # silent rebuild would resume from wrong energies while
                # loss_history claims prior progress (ADVICE r4)
                raise RuntimeError(
                    f"dense-dressing checkpoint {self.model_filepath} was "
                    f"saved with a .dense.npy sidecar, but {dense_path} is "
                    "missing; refusing to rebuild from the undressed "
                    "symbolic H. Restore the sidecar or restart the run."
                )
            else:
                # legacy checkpoint: the npz's PauliSum view was the
                # dressed H (pre-r4 sessions saved it in full)
                from ..ops.dense_dressing import paulisum_to_dense_fast

                self._dense_h = paulisum_to_dense_fast(
                    self.current_hamiltonian, self.n_qubits
                )


if __name__ == "__main__":
    # reference __main__ config (/root/reference/models/iqcc_hubbard.py:215-231)
    from ..ops.lattice import fermi_hubbard

    hamiltonian = fermi_hubbard(
        x_dimension=2, y_dimension=2, tunneling=1, coulomb=4, periodic=True, spinless=False
    )
    vqe = IQCC(hamiltonian, n_epoch=100, lr=1e-2, threshold=5e-3, tag="iqcc-hubbard-2x2")
    vqe.run()
