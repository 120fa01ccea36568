"""Phased-product-state closed forms vs the engine (engine/product_state.py).

These pin the three legs the >24-qubit on-chip validation rides on
(benchmarks/tpu_stream_big.py): (1) the closed-form per-qubit expectation
matches the engine's packed-term convention exactly, (2) the on-device
plane builder reproduces the host kron state, (3) the HBM-streaming
expectation kernel on those planes reproduces the closed form.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qsfh_tpu.algos.base import HubbardProblem
from qsfh_tpu.engine.expectation import Observable
from qsfh_tpu.engine.product_state import (
    product_expectation,
    product_planes_fn,
    product_state_host,
)


def _angles(n, seed=7):
    rng = np.random.default_rng(seed)
    return rng.uniform(0.4, 2.7, n), rng.uniform(-np.pi, np.pi, n)


@pytest.fixture(scope="module")
def problem_2x3():
    return HubbardProblem(2, 3, 1.0, 6.0, 6, 3, 3)


def test_closed_form_matches_dense(problem_2x3):
    p = problem_2x3
    n = p.n_qubits
    th, al = _angles(n)
    psi = product_state_host(n, th, al)
    assert abs(np.linalg.norm(psi) - 1.0) < 1e-12
    obs = Observable(p.qubit_hamiltonian, n)
    dense = float(obs.expectation(jnp.asarray(psi)))
    closed = product_expectation(p.qubit_hamiltonian, n, th, al)
    assert abs(dense - closed) < 1e-9


def test_planes_match_host():
    n = 10
    th, al = _angles(n, seed=11)
    psi = product_state_host(n, th, al)
    re, im = jax.jit(product_planes_fn(n, th, al))()
    np.testing.assert_allclose(
        np.asarray(re).ravel(), psi.real.astype(np.float32), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(im).ravel(), psi.imag.astype(np.float32), atol=2e-6
    )


def test_stream_fused_matches_grouped(problem_2x3):
    """One-call scalar-prefetch expectation == per-group form == closed form."""
    from qsfh_tpu.engine.pallas_kernels import (
        expectation_stream_fused,
        expectation_stream_planes,
    )

    p = problem_2x3
    n = p.n_qubits
    th, al = _angles(n, seed=23)
    obs = Observable(p.qubit_hamiltonian, n)
    xs, zs, cre, cim = obs._scan_terms()
    cre32, cim32 = cre.astype(np.float32), cim.astype(np.float32)
    build = product_planes_fn(n, th, al)

    @jax.jit
    def run():
        re, im = build()
        grouped = expectation_stream_planes(re, im, n, xs, zs, cre32, cim32)
        fused = expectation_stream_fused(re, im, n, xs, zs, cre32, cim32)
        return grouped, fused

    grouped, fused = (float(v) for v in run())
    closed = product_expectation(p.qubit_hamiltonian, n, th, al)
    assert abs(fused - grouped) < 1e-5 * max(1.0, abs(closed))
    assert abs(fused - closed) < 1e-4 * max(1.0, abs(closed))


@pytest.mark.slow  # ~12 s; expectation-side fused-vs-grouped stays fast
def test_apply_stream_fused_matches_grouped(problem_2x3):
    """One-call fused apply == per-group apply_stream_pallas planes."""
    from qsfh_tpu.engine.pallas_kernels import (
        apply_stream_fused,
        apply_stream_pallas,
    )

    p = problem_2x3
    n = p.n_qubits
    th, al = _angles(n, seed=29)
    obs = Observable(p.qubit_hamiltonian, n)
    xs, zs, cre, cim = obs._scan_terms()
    cre32, cim32 = cre.astype(np.float32), cim.astype(np.float32)
    build = product_planes_fn(n, th, al)

    @jax.jit
    def run():
        re, im = build()
        w = apply_stream_pallas(
            (re + 1j * im).reshape(-1).astype(jnp.complex64),
            n, xs, zs, cre32, cim32,
        )
        fre, fim = apply_stream_fused(re, im, n, xs, zs, cre32, cim32)
        return jnp.real(w), jnp.imag(w), fre.reshape(-1), fim.reshape(-1)

    wr, wi, fr, fi = run()
    np.testing.assert_allclose(np.asarray(fr), np.asarray(wr), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fi), np.asarray(wi), atol=1e-6)


@pytest.mark.slow  # ~26 s interpret-mode sweep; screen-kernel parity vs
# XLA stays fast in test_pallas.py::test_screen_stream_matches_xla
def test_screen_stream_pair_closed_form(problem_2x3):
    """Streamed screening on two DIFFERENT product states == 2 Im of the
    pair closed form (the <w|P|psi> matrix element factorizes per qubit)."""
    from qsfh_tpu.engine.pallas_kernels import screen_stream_planes
    from qsfh_tpu.engine.product_state import product_pair_term_values

    p = problem_2x3
    n = p.n_qubits
    th, al = _angles(n, seed=37)
    thw, alw = _angles(n, seed=41)
    obs = Observable(p.qubit_hamiltonian, n)
    xs, zs, cre, cim = obs._scan_terms()
    cre32, cim32 = cre.astype(np.float32), cim.astype(np.float32)
    build_p = product_planes_fn(n, th, al)
    build_w = product_planes_fn(n, thw, alw)

    # perm is static host metadata: take it from the API (the static
    # kernels emit slots in subgroup-sorted order, which perm records)
    _, perm = screen_stream_planes(
        jnp.zeros_like(build_w()[0]), jnp.zeros_like(build_w()[1]),
        jnp.zeros_like(build_p()[0]), jnp.zeros_like(build_p()[1]),
        n, xs, zs, cre32, cim32,
    )

    @jax.jit
    def run():
        re, im = build_p()
        wre, wim = build_w()
        contribs, _ = screen_stream_planes(
            wre, wim, re, im, n, xs, zs, cre32, cim32
        )
        return contribs

    contribs = np.asarray(run())

    vals = product_pair_term_values(p.qubit_hamiltonian, n, (thw, alw), (th, al))
    expected = 2.0 * vals.imag
    scale = max(1.0, float(np.abs(expected).max()))
    np.testing.assert_allclose(contribs, expected[perm], atol=1e-4 * scale)


def test_pair_term_values_reduce_to_expectation(problem_2x3):
    """w == psi pair values reduce to the validated single-state form."""
    p = problem_2x3
    n = p.n_qubits
    th, al = _angles(n, seed=43)
    from qsfh_tpu.engine.product_state import product_pair_term_values
    vals = product_pair_term_values(p.qubit_hamiltonian, n, (th, al), (th, al))
    psi = product_state_host(n, th, al)
    obs = Observable(p.qubit_hamiltonian, n)
    dense = float(obs.expectation(jnp.asarray(psi)))
    assert abs(float(vals.sum().real) - dense) < 1e-9


@pytest.mark.slow  # ~11 s; adjoint-kernel parity stays fast in test_pallas
def test_adjoint_stream_gradient_closed_form(problem_2x3):
    """Streamed adjoint sweep gradients == d/dtheta of the dressed closed
    form (finite difference, host float64) for a 3-rotation circuit."""
    from qsfh_tpu.engine.pallas_kernels import (
        adjoint_stream_pallas,
        apply_stream_pallas,
        rotation_stream_planes,
    )
    from qsfh_tpu.engine.product_state import (
        product_expectation as pexp,
        rotated_hamiltonian,
        stream_rotation_inputs,
    )

    p = problem_2x3
    n = p.n_qubits
    th, al = _angles(n, seed=47)
    rots = [
        ((1 << 0) | (1 << (n - 1)), 0, 0.31),
        ((1 << 1) | (1 << (n - 2)), (1 << 1) | (1 << (n - 2)), -0.73),
        (0, 0b11, 1.13),
    ]
    obs = Observable(p.qubit_hamiltonian, n)
    xs, zs, cre, cim = obs._scan_terms()
    cre32, cim32 = cre.astype(np.float32), cim.astype(np.float32)
    xb, zb, rth, phre, phim = stream_rotation_inputs(n, rots)
    ones = np.ones_like(rth)
    build = product_planes_fn(n, th, al)

    @jax.jit
    def sweep():
        re, im = build()
        fre, fim = rotation_stream_planes(re, im, n, xb, zb, rth, phre, phim)
        psi_f = (fre + 1j * fim).reshape(-1).astype(jnp.complex64)
        lam = apply_stream_pallas(psi_f, n, xs, zs, cre32, cim32)
        _, _, contribs = adjoint_stream_pallas(
            psi_f, lam, n,
            xb[::-1], zb[::-1],
            jnp.asarray(rth[::-1]), jnp.asarray(ones[::-1]),
            jnp.asarray(phre[::-1]), jnp.asarray(phim[::-1]),
        )
        return contribs

    grads_dev = 2.0 * np.asarray(sweep())[::-1]  # dE/dtheta = 2 Im<lam|P psi>

    h = 1e-5
    grads_fd = np.empty(len(rots))
    for t in range(len(rots)):
        def e_at(dt):
            shifted = [
                (x, z, thv + (dt if k == t else 0.0))
                for k, (x, z, thv) in enumerate(rots)
            ]
            return pexp(rotated_hamiltonian(p.qubit_hamiltonian, shifted), n, th, al)
        grads_fd[t] = (e_at(h) - e_at(-h)) / (2 * h)

    scale = max(1.0, float(np.abs(grads_fd).max()))
    np.testing.assert_allclose(grads_dev, grads_fd, atol=1e-3 * scale)


def test_observable_fused_route(problem_2x3, monkeypatch):
    """QSFH_STREAM_FUSED=1 routes Observable.*_scan through the fused
    kernels with identical results to the default XLA scan."""
    p = problem_2x3
    n = p.n_qubits
    th, al = _angles(n, seed=31)
    psi = jnp.asarray(product_state_host(n, th, al).astype(np.complex64))
    obs = Observable(p.qubit_hamiltonian, n)

    monkeypatch.delenv("QSFH_PALLAS", raising=False)
    e_ref = float(obs.expectation_scan(psi))
    w_ref = np.asarray(obs.apply_scan(psi))

    monkeypatch.setenv("QSFH_PALLAS", "1")
    monkeypatch.setenv("QSFH_PALLAS_MAX_N", "11")  # force the stream branch
    monkeypatch.setenv("QSFH_STREAM_FUSED", "1")
    e_fused = float(obs.expectation_scan(psi))
    w_fused = np.asarray(obs.apply_scan(psi))

    assert abs(e_fused - e_ref) < 1e-4 * max(1.0, abs(e_ref))
    np.testing.assert_allclose(w_fused, w_ref, atol=1e-5)


def test_rotated_closed_form_matches_dense(problem_2x3):
    """U^dag H U dressing + closed form == dense rotate-then-measure."""
    from qsfh_tpu.engine.gates import pauli_rotation
    from qsfh_tpu.engine.product_state import (
        product_expectation as pexp,
        rotated_hamiltonian,
    )

    p = problem_2x3
    n = p.n_qubits
    th, al = _angles(n, seed=17)
    rots = [
        ((1 << 0) | (1 << (n - 1)), 0, 0.3),           # XX, block-crossing at big n
        ((1 << 1) | (1 << (n - 2)), (1 << 1) | (1 << (n - 2)), -0.7),  # YY
        (0, 0b11, 1.1),                                 # ZZ, diagonal
    ]
    psi = jnp.asarray(product_state_host(n, th, al))
    for x, z, t in rots:
        psi = pauli_rotation(psi, n, x, z, t)
    obs = Observable(p.qubit_hamiltonian, n)
    dense = float(obs.expectation(psi))
    closed = pexp(rotated_hamiltonian(p.qubit_hamiltonian, rots), n, th, al)
    assert abs(dense - closed) < 1e-9


def test_stream_rotation_planes_closed_form(problem_2x3):
    """Streamed rotations on planes reproduce the dressed closed form."""
    from qsfh_tpu.engine.pallas_kernels import (
        expectation_stream_planes,
        rotation_stream_planes,
    )
    from qsfh_tpu.engine.product_state import (
        product_expectation as pexp,
        rotated_hamiltonian,
        stream_rotation_inputs,
    )

    p = problem_2x3
    n = p.n_qubits
    th, al = _angles(n, seed=19)
    rots = [
        ((1 << 0) | (1 << (n - 1)), 0, 0.3),
        ((1 << 1) | (1 << (n - 2)), (1 << 1) | (1 << (n - 2)), -0.7),
        (0, 0b11, 1.1),
    ]
    obs = Observable(p.qubit_hamiltonian, n)
    xs, zs, cre, cim = obs._scan_terms()
    xb, zb, rth, phre, phim = stream_rotation_inputs(n, rots)
    build = product_planes_fn(n, th, al)

    @jax.jit
    def run():
        re, im = build()
        re, im = rotation_stream_planes(re, im, n, xb, zb, rth, phre, phim)
        return expectation_stream_planes(
            re, im, n, xs, zs, cre.astype(np.float32), cim.astype(np.float32)
        )

    e = float(run())
    closed = pexp(rotated_hamiltonian(p.qubit_hamiltonian, rots), n, th, al)
    assert abs(e - closed) < 1e-4 * max(1.0, abs(closed))


def test_stream_planes_closed_form(problem_2x3):
    from qsfh_tpu.engine.pallas_kernels import expectation_stream_planes

    p = problem_2x3
    n = p.n_qubits
    th, al = _angles(n, seed=13)
    obs = Observable(p.qubit_hamiltonian, n)
    xs, zs, cre, cim = obs._scan_terms()

    build = product_planes_fn(n, th, al)

    @jax.jit
    def run():
        re, im = build()
        norm2 = jnp.sum(re * re + im * im)
        e = expectation_stream_planes(
            re, im, n, xs, zs, cre.astype(np.float32), cim.astype(np.float32)
        )
        return e, norm2

    e, norm2 = (float(v) for v in run())
    assert abs(norm2 - 1.0) < 1e-5
    closed = product_expectation(p.qubit_hamiltonian, n, th, al)
    assert abs(e - closed) < 1e-4 * max(1.0, abs(closed))


def test_planes_pinned_qubits_no_nan():
    """theta = 0 / pi pins a qubit; the log-magnitude path must select the
    -inf weight per bit (a multiplicative bit*delta form hits 0 * -inf =
    NaN) and agree with the exact host kron state."""
    n = 8
    th, al = _angles(n, seed=3)
    th[0], th[3], th[5] = 0.0, np.pi, 0.0
    psi = product_state_host(n, th, al)
    re, im = jax.jit(product_planes_fn(n, th, al))()
    re, im = np.asarray(re).ravel(), np.asarray(im).ravel()
    assert np.isfinite(re).all() and np.isfinite(im).all()
    np.testing.assert_allclose(re, psi.real.astype(np.float32), atol=2e-6)
    np.testing.assert_allclose(im, psi.imag.astype(np.float32), atol=2e-6)
