"""Chunked on-chip ADAPT training: K train steps fused in one program.

The flagship 3x3 convergence run (VERDICT round-2 #1) needs tens of
thousands of inner Adam iterations.  Driving :meth:`ADAPT.run`'s inner
loop against the tunneled TPU costs 6 dispatches + 5 scalar fetches per
iteration -- the tunnel round-trip dominates and the chip idles.  This
module runs the inner loop the way the chip wants it:

* the WHOLE train step (fwd circuit + energy + cotangent + adjoint
  gradient + Sz/S^2/fidelity metrics + Adam update), composed from
  ADAPT's raw split stages (``algos/adapt.py`` ``_build_step_split``),
  UNROLLED ``chunk_iters`` times inside ONE jitted program
  (scan-over-pallas bodies cost the remote compile service ~150 s even
  for tiny bodies, while unrolled chains compile in seconds --
  ``benchmarks/tpu_bisect_basis.jsonl``);
* theta and the Adam state are program inputs AND outputs, so chunks
  compose without re-tracing and only small real arrays cross the
  host/program boundary (the axon backend rejects complex jit I/O);
* per-iteration energies and gradient norms are fetched each chunk (the
  fetch proves the whole chain executed: ``jax.block_until_ready``
  returning does NOT prove execution on this backend);
* full metrics (Sz, S^2, manifold fidelity) are computed on the LAST
  iteration of each chunk by default (``metrics_every_iter=True``
  computes them every iteration; the S^2 scan is the most expensive
  observable at 3x3, ~150 flip-mask groups).

Epoch structure (selection -> grow -> dynamic lr -> inner loop) follows
the reference's ADAPT loop (``/root/reference/models/adapt_vqe.py:363-
467``) exactly like :meth:`ADAPT.run`; only the inner loop's execution
shape differs.  Convergence bookkeeping is interleaved with an
*in-flight* checkpoint (params + optimizer moments + epoch/iter
counters) written every chunk, so a mid-epoch crash resumes without
redoing the epoch (the reference loses in-flight inner progress on
crash, resuming from the last epoch boundary).

Compile-service hygiene: every (ansatz shape, K) pair is one fresh
program; on an UNIMPLEMENTED rejection the runner bumps the program
salt (fresh hashes evict cached failures) and halves K before retrying.
"""

from __future__ import annotations

import json
import os
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..engine.state import bitpos
from ..io import checkpoint as ckpt


def initial_state_reim(vqe) -> np.ndarray:
    """Host-side (2, 2^n) one-hot |psi0> for the occupied k-modes.

    Fed as a program input: tracing the basis one-hot as a constant
    costs the remote compile service ~2 min at 18q
    (``benchmarks/tpu_bisect_basis.jsonl``).
    """
    index = 0
    for q in vqe._occupied_modes:
        index |= 1 << bitpos(q, vqe.n_qubits)
    arr = np.zeros((2, 1 << vqe.n_qubits), np.dtype(vqe._rdt))
    arr[0, index] = 1.0
    return arr


def _flatten_opt(opt_state):
    leaves, treedef = jax.tree_util.tree_flatten(opt_state)
    return [np.asarray(x) for x in leaves], treedef


class FusedAdaptRunner:
    """Drive an :class:`ADAPT` instance with chunked fused programs.

    Parameters
    ----------
    vqe:
        A constructed ADAPT driver (``circuit_mode="split"``).  Its
        ``selected_indices`` / ``params_t`` / ``results`` are advanced
        in place and checkpointed through the driver's own
        ``save_model`` so artifacts stay schema-compatible.
    chunk_iters:
        Iterations unrolled per program (K).  Falls back K -> K/2 -> 1
        on remote-compile rejections.
    metrics_every_iter:
        Compute Sz/S^2/fidelity on every unrolled iteration instead of
        only the chunk's last one.  Off by default: it multiplies the
        program's observable scans by K, and the intermediate values
        only feed log lines (results arrays replicate the freshest
        value so lengths stay aligned with ``iteration loss``).
    inflight_path:
        Where to write the per-chunk crash-recovery state.  Defaults to
        ``<model dir>/<tag>.inflight.npz``.
    """

    def __init__(
        self,
        vqe,
        chunk_iters: int = 8,
        metrics_every_iter: bool = False,
        inflight_path: Optional[str] = None,
        max_inner_iterations: Optional[int] = None,
        verbose: bool = True,
        on_epoch_end=None,
        dispatch: str = "fused",
        df_energy: bool = True,
    ):
        if vqe.circuit_mode != "split":
            raise ValueError("FusedAdaptRunner requires circuit_mode='split'")
        if dispatch not in ("fused", "stages"):
            raise ValueError("dispatch must be 'fused' or 'stages'")
        self.vqe = vqe
        self.chunk_iters = int(chunk_iters)
        self.metrics_every_iter = bool(metrics_every_iter)
        # double-float Rayleigh energy of each chunk's final state: one
        # extra (4,)-fetch per chunk, gives the log/results an energy
        # trustworthy below the plain-c64 readout's noise (VERDICT r3
        # missing #1).  QSFH_DF_ENERGY=0 disables.
        self.df_energy = bool(df_energy) and (
            os.environ.get("QSFH_DF_ENERGY", "1") == "1"
        )
        self._df_cache = {}
        self._last_df_energy: Optional[float] = None
        self.max_inner_iterations = (
            vqe.max_inner_iterations if max_inner_iterations is None
            else int(max_inner_iterations)
        )
        self.verbose = verbose
        self.on_epoch_end = on_epoch_end  # called(epoch_index) after save_model
        # dispatch="stages" runs the inner loop as per-stage jitted calls
        # (fwd / energy / cotangent / adjoint / update, metrics on chunk
        # boundaries) instead of one K-unrolled program.  At large ansatz
        # sizes the fused program is untraceable: 727 ops x K=8 put the
        # streaming adjoint's one-pallas-call-per-block-crossing-term
        # structure ~5k kernels deep into a single HLO (observed 75+ min
        # of host tracing, 2026-08-19); each stage alone is one
        # scan/chain and compiles in seconds.
        self.dispatch = dispatch
        base = ckpt.resolve(vqe.model_filepath)
        self.inflight_path = inflight_path or (base + ".inflight.npz")
        self._psi0 = initial_state_reim(vqe)
        self._chunk_cache = {}
        self._stage_cache = {}

    # -- program construction ---------------------------------------------------

    def _build_chunk(self, indices: Sequence[int], optimizer, k: int):
        """One jitted program: K unrolled train steps, theta/opt as I/O."""
        key = (tuple(indices), k, float(self.vqe.program_salt))
        if key in self._chunk_cache:
            return self._chunk_cache[key]
        raw = self.vqe._build_step_split(tuple(indices), optimizer).raw_stages
        every = self.metrics_every_iter

        def chunk(psi0_r, th, opt_state):
            es, gns, mets = [], [], []
            psi_r = None
            for _ in range(k):
                psi_r = raw["fwd_from"](psi0_r, th)
                es.append(raw["energy"](psi_r))
                lam_r = raw["cotangent"](psi_r)
                g = raw["adjoint"](psi_r, lam_r, th)
                if every:
                    mets.append(raw["metrics"](psi_r))
                th, opt_state, gn = raw["update"](th, g, opt_state)
                gns.append(gn)
            if not every:
                mets.append(raw["metrics"](psi_r))
            sz, s2, fid = (jnp.stack(col) for col in zip(*mets))
            return th, opt_state, jnp.stack(es), jnp.stack(gns), sz, s2, fid

        fn = jax.jit(chunk)
        self._chunk_cache[key] = fn
        return fn

    def _build_df(self, indices: Sequence[int], optimizer):
        """Jitted (psi0, th) -> (4,) double-float Rayleigh energy program.

        Evaluated at the POST-update theta each chunk -- the parameters the
        in-flight checkpoint carries, i.e. the same point anchor_f64.py
        re-evaluates, so the two are directly comparable.
        """
        key = (tuple(indices), float(self.vqe.program_salt))
        if key in self._df_cache:
            return self._df_cache[key]
        raw = self.vqe._build_step_split(tuple(indices), optimizer).raw_stages
        # two SEPARATE small programs (not one fused jit): the remote TPU
        # compile service rejects long compilations, and the fwd scan HLO
        # is already cached from the chunk stages
        f_fwd = jax.jit(raw["fwd_from"])
        f_df = jax.jit(raw["energy_df"])

        def df_from(psi0_r, th):
            return f_df(f_fwd(psi0_r, th))

        self._df_cache[key] = df_from
        return df_from

    def _build_stages(self, indices: Sequence[int], optimizer):
        """Separately jitted raw stages (dispatch='stages')."""
        key = (tuple(indices), float(self.vqe.program_salt))
        if key in self._stage_cache:
            return self._stage_cache[key]
        raw = self.vqe._build_step_split(tuple(indices), optimizer).raw_stages
        merged = (os.environ.get("QSFH_MERGE_STAGES", "1") == "1"
                  and "cot_e" in raw)
        names = (("fwd_from", "cot_e", "adj_upd", "metrics") if merged else
                 ("fwd_from", "energy", "cotangent", "adjoint", "metrics",
                  "update"))
        fns = {name: jax.jit(raw[name]) for name in names}
        self._stage_cache[key] = fns
        return fns

    def _chunk_stages(self, fns, psi0, th, opt_state, k: int):
        """K train steps as per-stage dispatches; same returns as the
        fused chunk program (th, opt, energies, gnorms, sz, s2, fid).

        The first iteration of each chunk logs fetch-synced per-stage
        times once per ansatz shape (QSFH_STAGE_TIMES=0 silences) so the
        slow stage is visible without a device trace."""
        es, gns, mets = [], [], []
        psi_r = None
        merged = "cot_e" in fns
        # log fetch-synced stage marks on the FIRST chunk of a shape (cold:
        # includes cache fetch + program load) and again on the THIRD
        # (warm steady state) so the slow stage is visible without a trace
        if not hasattr(self, "_timed_fns"):
            self._timed_fns = {}
        n_timed = self._timed_fns.get(id(fns), 0)
        time_stages = (
            self.verbose
            and os.environ.get("QSFH_STAGE_TIMES", "1") == "1"
            and n_timed < 2
        )
        self._timed_fns[id(fns)] = n_timed + 1
        for j in range(k):
            if time_stages and j == 0:
                marks = {}

                def timed(name, fn, *args):
                    s0 = time.time()
                    v = fn(*args)
                    jax.tree_util.tree_map(
                        lambda x: np.asarray(x).ravel()[:1], v
                    )  # fetch = honest stage boundary on this backend
                    marks[name] = time.time() - s0
                    return v

                psi_r = timed("fwd", fns["fwd_from"], psi0, th)
                if merged:
                    lam_r, e = timed("cot_e", fns["cot_e"], psi_r)
                    es.append(e)
                    th, opt_state, gn = timed(
                        "adj_upd", fns["adj_upd"], psi_r, lam_r, th, opt_state
                    )
                else:
                    es.append(timed("energy", fns["energy"], psi_r))
                    lam_r = timed("cotangent", fns["cotangent"], psi_r)
                    g = timed("adjoint", fns["adjoint"], psi_r, lam_r, th)
                    th, opt_state, gn = timed(
                        "update", fns["update"], th, g, opt_state
                    )
                gns.append(gn)
                self._log(
                    "[fused] stage times (fetch-synced, "
                    + ("cold): " if n_timed == 0 else "warm): ")
                    + " ".join(f"{n} {v*1e3:.0f}ms" for n, v in marks.items())
                )
                if self.metrics_every_iter:
                    mets.append(fns["metrics"](psi_r))
                continue
            psi_r = fns["fwd_from"](psi0, th)
            if merged:
                lam_r, e = fns["cot_e"](psi_r)
                es.append(e)
                if self.metrics_every_iter:
                    mets.append(fns["metrics"](psi_r))
                th, opt_state, gn = fns["adj_upd"](psi_r, lam_r, th, opt_state)
            else:
                es.append(fns["energy"](psi_r))
                lam_r = fns["cotangent"](psi_r)
                g = fns["adjoint"](psi_r, lam_r, th)
                if self.metrics_every_iter:
                    mets.append(fns["metrics"](psi_r))
                th, opt_state, gn = fns["update"](th, g, opt_state)
            gns.append(gn)
        if not self.metrics_every_iter:
            mets.append(fns["metrics"](psi_r))
        sz, s2, fid = (jnp.stack(col) for col in zip(*mets))
        return th, opt_state, jnp.stack(es), jnp.stack(gns), sz, s2, fid

    # -- in-flight state ----------------------------------------------------------

    def _save_inflight(self, th, opt_state, epoch: int, lr: float):
        leaves, _ = _flatten_opt(opt_state)
        blob = {
            "t": np.asarray(th),
            "selected_indices": np.asarray(
                self.vqe.selected_indices, dtype=np.int64
            ),
            "epoch": np.int64(epoch),
            "lr": np.float64(lr),
            "n_iters": np.int64(len(self.vqe.results["iteration loss"])),
        }
        for i, leaf in enumerate(leaves):
            blob[f"opt_{i}"] = leaf
        # np.savez appends ".npz" unless the name already ends with it
        tmp = self.inflight_path + ".tmp.npz"
        os.makedirs(os.path.dirname(tmp) or ".", exist_ok=True)
        np.savez(tmp, **blob)
        os.replace(tmp, self.inflight_path)

    def load_inflight(self):
        """Return (epoch, lr, opt_leaves) if a matching in-flight state
        exists for the CURRENT ansatz-growth step, else None.

        Matching means the stored selected_indices extend the driver's
        checkpointed ones -- i.e. the crash happened inside an epoch
        whose selection is not yet in the epoch-boundary checkpoint.
        """
        if not os.path.exists(self.inflight_path):
            return None
        d = np.load(self.inflight_path, allow_pickle=False)
        stored = [int(i) for i in d["selected_indices"]]
        cur = self.vqe.selected_indices
        if stored[: len(cur)] != cur:
            return None
        opt_leaves = []
        i = 0
        while f"opt_{i}" in d:
            opt_leaves.append(d[f"opt_{i}"])
            i += 1
        return {
            "selected_indices": stored,
            "t": d["t"],
            "epoch": int(d["epoch"]),
            "lr": float(d["lr"]),
            "n_iters": int(d["n_iters"]),
            "opt_leaves": opt_leaves,
        }

    # -- the loop -----------------------------------------------------------------

    def _log(self, msg: str):
        if self.verbose:
            print(msg, flush=True)

    def _run_inner(self, optimizer, lr: float, epoch: int, opt_state=None):
        """Chunked inner optimization; returns final gradient norm."""
        vqe = self.vqe
        th = jnp.asarray(np.asarray(vqe.params_t, dtype=np.dtype(vqe._rdt)))
        if opt_state is None:
            opt_state = optimizer.init(th)
        k = self.chunk_iters
        inner = 0
        gnorm = float("inf")
        psi0 = self._psi0
        failures = 0
        while inner < self.max_inner_iterations:
            t0 = time.time()
            try:
                if self.dispatch == "stages":
                    fns = self._build_stages(vqe.selected_indices, optimizer)
                    th2, opt2, es, gns, sz, s2, fid = self._chunk_stages(
                        fns, psi0, th, opt_state, k
                    )
                else:
                    fn = self._build_chunk(vqe.selected_indices, optimizer, k)
                    th2, opt2, es, gns, sz, s2, fid = fn(psi0, th, opt_state)
                e_df = None
                if self.df_energy:
                    from ..engine.dfloat import combine_rayleigh

                    df_fn = self._build_df(vqe.selected_indices, optimizer)
                    # at the POST-update theta: the parameters the in-flight
                    # checkpoint saves (and anchor_f64 re-evaluates)
                    e_df = combine_rayleigh(
                        np.asarray(df_fn(psi0, th2), np.float64)
                    )
                t_disp = time.time() - t0
                es = np.asarray(es, dtype=np.float64)  # fetch = proof of execution
                gns = np.asarray(gns, dtype=np.float64)
                sz = np.asarray(sz, dtype=np.float64)
                s2 = np.asarray(s2, dtype=np.float64)
                fid = np.asarray(fid, dtype=np.float64)
                t_fetch = time.time() - t0 - t_disp
            except Exception as err:  # remote compile rejection / sick window
                failures += 1
                if failures > 8:
                    raise
                self._chunk_cache.pop(
                    (tuple(vqe.selected_indices), k, float(vqe.program_salt)),
                    None,
                )
                self._stage_cache.pop(
                    (tuple(vqe.selected_indices), float(vqe.program_salt)),
                    None,
                )
                self._df_cache.pop(
                    (tuple(vqe.selected_indices), float(vqe.program_salt)),
                    None,
                )
                # the salt is a REAL rotation angle folded into the program
                # (changes the hash, evicting cached-failure entries); keep
                # the bump far below the c64 noise floor so it can never
                # perturb the physics of a convergence run
                vqe.program_salt = float(vqe.program_salt) + 1e-12
                new_k = max(1, k // 2)
                self._log(
                    f"[fused] chunk failed ({type(err).__name__}: "
                    f"{str(err)[:200]}); salt bumped, K {k}->{new_k}"
                )
                if k == 1 and new_k == 1:
                    time.sleep(30.0)  # sick window: back off before re-salt
                k = new_k
                continue
            failures = 0
            dt = time.time() - t0
            th, opt_state = th2, opt2
            # bookkeeping mirrors ADAPT.run (metrics arrays replicate the
            # freshest value when metrics_every_iter is off)
            if e_df is not None:
                self._last_df_energy = e_df
            for j in range(len(es)):
                mj = min(j, len(sz) - 1) if len(sz) > 1 else 0
                vqe.results["iteration loss"].append(float(es[j]))
                vqe.results["Sz"].append(float(sz[mj]))
                vqe.results["S^2"].append(float(s2[mj]))
                vqe.results["fidelity"].append(float(fid[mj]))
                extra = (
                    {"E_df": e_df}
                    if (e_df is not None and j == len(es) - 1)
                    else {}
                )
                vqe.metrics.log(
                    iter=len(vqe.results["iteration loss"]),
                    loss=float(es[j]),
                    norm=float(gns[j]),
                    fidelity=float(fid[mj]),
                    Sz=float(sz[mj]),
                    S_square=float(s2[mj]),
                    **extra,
                )
            inner += len(es)
            gnorm = float(gns[-1])
            vqe.params_t = th
            t_book = time.time() - t0 - t_disp - t_fetch
            self._save_inflight(th, opt_state, epoch, lr)
            t_save = time.time() - t0 - t_disp - t_fetch - t_book
            df_part = f" | E_df {e_df:+.7f}" if e_df is not None else ""
            self._log(
                f"[fused] epoch {epoch + 1} iter {len(vqe.results['iteration loss'])}"
                f" | E {es[-1]:+.7f}{df_part} | gnorm {gnorm:.3e}"
                f" | fid {fid[-1]:.6f}"
                f" | {dt / max(len(es), 1) * 1e3:.1f} ms/iter (K={k})"
                f" [disp {t_disp:.1f}s fetch {t_fetch:.1f}s book {t_book:.1f}s"
                f" save {t_save:.1f}s]"
            )
            if bool(np.any(gns < vqe.threshold2)):
                break
        return gnorm

    def run(self, n_epoch: Optional[int] = None, select_fn=None) -> dict:
        """Selection/growth/optimize epochs until empty selection or cap.

        Resumes a matching in-flight state transparently (same epoch,
        same optimizer moments) before falling back to the epoch-
        boundary flow.

        ``select_fn`` overrides the driver's own (device-precision)
        ``select_operator`` with an external authority returning the same
        ``(indices, grads)`` contract -- the flagship uses a CPU-float64
        subprocess screen here once thresholds drop below the on-chip c64
        screening noise (~1e-5-1e-4 per gradient at 18q).
        """
        vqe = self.vqe
        if select_fn is None:
            select_fn = vqe.select_operator
        if n_epoch is not None:
            vqe.n_epoch = n_epoch
        i_epoch = len(vqe.results["epoch loss"])
        if vqe.ground_state_energy is not None:
            self._log(f"ground state energy: {vqe.ground_state_energy}")

        inflight = self.load_inflight()
        if inflight is not None and inflight["epoch"] == i_epoch:
            self._log(
                f"[fused] resuming in-flight epoch {i_epoch + 1}: "
                f"{len(inflight['selected_indices'])} params, lr {inflight['lr']:.6g}"
            )
            new = inflight["selected_indices"][len(vqe.selected_indices):]
            vqe.selected_indices = inflight["selected_indices"]
            vqe.results["selected operators"] += [
                repr(vqe.fermion_pool[i]).replace("\n", " ") for i in new
            ]
            if len(vqe.results["n_params"]) <= i_epoch:
                vqe.results["n_params"].append(len(vqe.selected_indices))
            vqe.params_t = jnp.asarray(
                inflight["t"].astype(np.dtype(vqe._rdt))
            )
            lr = inflight["lr"]
            optimizer = optax.adam(lr)
            template = optimizer.init(
                jnp.asarray(np.zeros(len(vqe.selected_indices), np.dtype(vqe._rdt)))
            )
            _, treedef = jax.tree_util.tree_flatten(template)
            opt_state = jax.tree_util.tree_unflatten(
                treedef,
                [jnp.asarray(x) for x in inflight["opt_leaves"]],
            )
            self._finish_epoch(optimizer, lr, i_epoch, opt_state)
            i_epoch += 1

        while i_epoch < vqe.n_epoch:
            t0 = time.time()
            new_indices, max_grads = select_fn()
            self._log(
                f"[fused] screening: {len(new_indices)} ops in {time.time()-t0:.1f}s"
            )
            if not new_indices:
                self._log("\nconvergence criterion has satisfied, break the loop!")
                break
            vqe.selected_indices = vqe.selected_indices + new_indices
            vqe.params_t = jnp.asarray(
                np.concatenate(
                    [
                        np.asarray(vqe.params_t),
                        np.zeros(len(new_indices), dtype=np.dtype(vqe._rdt)),
                    ]
                )
            )
            vqe.results["selected operators"] += [
                repr(vqe.fermion_pool[i]).replace("\n", " ") for i in new_indices
            ]
            vqe.results["n_params"].append(len(vqe.selected_indices))
            n_new = len(new_indices)
            lr = float(np.linalg.norm(max_grads) / np.sqrt(n_new) * vqe.lr_scale)
            optimizer = optax.adam(lr)
            self._log(
                f"epoch {i_epoch + 1}: selected {n_new} operators, lr = {lr:.6f}"
            )
            self._finish_epoch(optimizer, lr, i_epoch, None)
            i_epoch += 1
        return vqe.results

    def _finish_epoch(self, optimizer, lr, i_epoch, opt_state):
        vqe = self.vqe
        self._last_df_energy = None
        self._run_inner(optimizer, lr, i_epoch, opt_state)
        vqe.results["epoch loss"].append(vqe.results["iteration loss"][-1])
        if self._last_df_energy is not None:
            # parallel per-epoch record of the trustworthy (double-float
            # Rayleigh) energy; "epoch loss" keeps the reference-schema
            # plain readout
            vqe.results.setdefault("epoch loss df", []).append(
                float(self._last_df_energy)
            )
        vqe.save_model()
        if os.path.exists(self.inflight_path):
            os.remove(self.inflight_path)
        if self.on_epoch_end is not None:
            self.on_epoch_end(i_epoch)
        if vqe.plot and vqe.ground_state_energy is not None:
            from ..io.metrics import plot_energy_iterations

            plot_energy_iterations(
                vqe.img_filepath,
                vqe.results["iteration loss"],
                vqe.results["epoch loss"],
                vqe.ground_state_energy,
            )
