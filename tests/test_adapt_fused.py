"""FusedAdaptRunner: chunked fused train loop == sequential ADAPT loop.

The chunked runner (qsfh_tpu/algos/adapt_fused.py) exists so the flagship
convergence run can execute K iterations per device program; these tests
pin its semantics to the sequential driver on CPU before it is trusted
on the chip.
"""

import os

import numpy as np
import pytest

from qsfh_tpu.algos.adapt import ADAPT
from qsfh_tpu.algos.adapt_fused import FusedAdaptRunner, initial_state_reim


def _mk(tmp_path, sub, **kw):
    cfg = dict(
        n_epoch=2,
        threshold1=1e-2,
        threshold2=1e-2,
        x_dimension=2,
        y_dimension=2,
        n_electrons=4,
        n_spin_up=2,
        n_spin_down=2,
        tunneling=1,
        coulomb=6,
        results_root=str(tmp_path / sub),
        plot=False,
        log_metrics=False,
        max_inner_iterations=40,
    )
    cfg.update(kw)
    os.makedirs(cfg["results_root"], exist_ok=True)
    return ADAPT(**cfg)


def test_chunked_matches_sequential(tmp_path):
    # max_inner must be a MULTIPLE of chunk_iters: the chunked runner
    # finishes its K-block, so a non-multiple leaves the two loops at
    # different params when epoch 2's screening selects operators
    seq = _mk(tmp_path, "seq", max_inner_iterations=12)
    seq.run()

    fused = _mk(tmp_path, "fused", max_inner_iterations=12)
    runner = FusedAdaptRunner(fused, chunk_iters=4, metrics_every_iter=True)
    runner.run()

    # same selections, same growth
    assert fused.selected_indices == seq.selected_indices
    assert fused.results["n_params"] == seq.results["n_params"]

    # identical math while both are mid-epoch; trajectories may part only
    # after the sequential loop breaks mid-chunk (the chunked runner
    # finishes its K-block).  Epoch 1's first min(len) iterations must
    # agree to float-assoc noise.
    a = np.asarray(seq.results["iteration loss"])
    b = np.asarray(fused.results["iteration loss"])
    m = min(12, len(a), len(b))
    np.testing.assert_allclose(a[:m], b[:m], rtol=1e-9, atol=1e-10)

    sa = np.asarray(seq.results["Sz"])[:m]
    sb = np.asarray(fused.results["Sz"])[:m]
    np.testing.assert_allclose(sa, sb, atol=1e-8)

    # chunk overshoot is bounded by K-1 iterations per epoch
    assert len(b) <= len(a) + 2 * (4 - 1)

    # epoch checkpoints cleaned up the in-flight file
    assert not os.path.exists(runner.inflight_path)


def test_inflight_roundtrip(tmp_path):
    vqe = _mk(tmp_path, "infl")
    runner = FusedAdaptRunner(vqe, chunk_iters=2)
    import optax

    vqe.selected_indices = [3, 1]
    th = np.asarray([0.1, -0.2], dtype=np.dtype(vqe._rdt))
    vqe.params_t = th
    opt = optax.adam(1e-2)
    state = opt.init(th)
    runner._save_inflight(th, state, epoch=5, lr=1e-2)

    got = runner.load_inflight()
    assert got is not None
    assert got["epoch"] == 5
    assert got["selected_indices"] == [3, 1]
    np.testing.assert_array_equal(got["t"], th)
    # moments round-trip positionally
    import jax

    leaves, _ = jax.tree_util.tree_flatten(state)
    assert len(got["opt_leaves"]) == len(leaves)
    for a, b in zip(got["opt_leaves"], leaves):
        np.testing.assert_array_equal(a, np.asarray(b))

    # a mismatching ansatz prefix refuses to resume
    vqe.selected_indices = [2, 1]
    assert runner.load_inflight() is None


def test_initial_state_matches_driver(tmp_path):
    vqe = _mk(tmp_path, "psi0")
    arr = initial_state_reim(vqe)
    assert arr.shape == (2, 1 << vqe.n_qubits)
    # exactly one real amplitude set
    assert arr[0].sum() == 1.0 and np.count_nonzero(arr) == 1
    from qsfh_tpu.engine.state import basis_state, to_reim_host

    ref = to_reim_host(
        np.asarray(basis_state(vqe.n_qubits, vqe._occupied_modes, dtype=vqe.dtype)),
        vqe.dtype,
    )
    np.testing.assert_array_equal(arr, np.asarray(ref))


def test_df_energy_matches_f64_of_final_state(tmp_path):
    """The per-chunk double-float Rayleigh energy (VERDICT r3 missing #1
    wiring) must match a float64 evaluation of the SAME final state to
    well below the plain-f32 readout's noise floor."""
    import jax.numpy as jnp

    vqe = _mk(tmp_path, "df", n_epoch=1, max_inner_iterations=8)
    runner = FusedAdaptRunner(vqe, chunk_iters=4, df_energy=True)
    runner.run()

    assert "epoch loss df" in vqe.results
    assert len(vqe.results["epoch loss df"]) == len(vqe.results["epoch loss"])
    e_df = vqe.results["epoch loss df"][-1]

    # f64 referee on the identical parameters and the SAME f32-quantized
    # state the df reduction consumed (expectation_df casts the planes to
    # f32 -- the contract is reduction parity, not state parity)
    psi = np.asarray(vqe.state(jnp.asarray(vqe.params_t)))
    psi32 = (
        psi.real.astype(np.float32).astype(np.float64)
        + 1j * psi.imag.astype(np.float32).astype(np.float64)
    )
    H = vqe.problem.observables["H"]
    num = float(np.real(np.vdot(psi32, np.asarray(H.apply(jnp.asarray(psi32))))))
    ref = num / float(np.vdot(psi32, psi32).real)
    assert abs(e_df - ref) < 1e-10 * max(1.0, abs(ref)), (e_df, ref)


def test_merged_stages_match_split(tmp_path, monkeypatch):
    """dispatch='stages' with merged cot_e/adj_upd programs (3 dispatches
    per iteration) must reproduce the 6-program split trajectory: the
    merged energy is 0.5*Re<psi|2H psi| from the cotangent pass instead
    of a separate H expectation scan."""
    monkeypatch.setenv("QSFH_MERGE_STAGES", "0")
    split = _mk(tmp_path, "split6", n_epoch=1, max_inner_iterations=8)
    r0 = FusedAdaptRunner(split, chunk_iters=4, dispatch="stages")
    r0.run()

    monkeypatch.setenv("QSFH_MERGE_STAGES", "1")
    merged = _mk(tmp_path, "merged3", n_epoch=1, max_inner_iterations=8)
    r1 = FusedAdaptRunner(merged, chunk_iters=4, dispatch="stages")
    r1.run()

    assert merged.selected_indices == split.selected_indices
    a = np.asarray(split.results["iteration loss"])
    b = np.asarray(merged.results["iteration loss"])
    assert len(a) == len(b)
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(split.results["fidelity"]),
        np.asarray(merged.results["fidelity"]),
        atol=1e-9,
    )
