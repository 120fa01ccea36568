"""Double-float expectation: f64-grade reductions from pure-f32 arithmetic.

The claim (VERDICT round-2 next #4): <psi|H|psi> of an f32 state computed
by engine/dfloat.py matches the float64 evaluation OF THE SAME f32 STATE
to ~1e-13 relative, where the plain f32 reduction sits at ~1e-6.  All
device arithmetic is f32 (TPU-legal); the f64 here is the host referee.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsfh_tpu.engine import expectation as ex
from qsfh_tpu.engine.dfloat import (
    combine_df,
    combine_rayleigh,
    df_add,
    df_from_f64,
    df_mul,
    df_sum,
    expectation_df,
    expectation_norm_df,
    norm_df,
    two_prod,
    two_sum,
)
from qsfh_tpu.ops.jw import jordan_wigner
from qsfh_tpu.ops.lattice import fermi_hubbard


def _f32(x):
    return jnp.asarray(np.asarray(x, np.float32))


def test_two_sum_exact():
    a, b = _f32(1.0), _f32(1e-9)
    s, e = two_sum(a, b)
    # the pair recovers what f32 addition lost
    assert float(s) == 1.0
    np.testing.assert_allclose(float(s) + float(e), 1.0 + 1e-9, rtol=1e-16)


def test_two_prod_exact():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(1000).astype(np.float32)
    b = rng.standard_normal(1000).astype(np.float32)
    p, e = two_prod(_f32(a), _f32(b))
    exact = a.astype(np.float64) * b.astype(np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_allclose(got, exact, rtol=0, atol=0)  # bit exact


def test_df_sum_beats_f32():
    rng = np.random.default_rng(1)
    v = rng.standard_normal(1 << 16).astype(np.float32)
    exact = v.astype(np.float64).sum()
    hi, lo = df_sum(_f32(v), _f32(np.zeros_like(v)))
    df_val = float(np.float64(hi) + np.float64(lo))
    f32_val = float(v.sum(dtype=np.float32))
    assert abs(df_val - exact) <= 1e-10 * max(1.0, abs(exact))
    # and it genuinely beats the plain f32 reduction
    assert abs(df_val - exact) < abs(f32_val - exact) or f32_val == exact


def test_df_mul_chain_precision():
    x = df_from_f64(np.array([np.pi]))
    y = df_from_f64(np.array([np.e]))
    z = df_mul((_f32(x[0]), _f32(x[1])), (_f32(y[0]), _f32(y[1])))
    got = float(np.float64(np.asarray(z[0])[0]) + np.float64(np.asarray(z[1])[0]))
    np.testing.assert_allclose(got, np.pi * np.e, rtol=1e-14)


@pytest.mark.parametrize(
    "nx,ny",
    [(2, 2), pytest.param(2, 3, marks=pytest.mark.slow)],
)
def test_expectation_df_matches_f64_of_f32_state(nx, ny):
    n = 2 * nx * ny
    H = jordan_wigner(fermi_hubbard(nx, ny, 1.0, 6.0, periodic=True))
    rng = np.random.default_rng(7)
    psi64 = rng.standard_normal(1 << n) + 1j * rng.standard_normal(1 << n)
    psi64 /= np.linalg.norm(psi64)
    # quantize the STATE to f32 -- that is the object living on the chip
    re32 = psi64.real.astype(np.float32)
    im32 = psi64.imag.astype(np.float32)
    psi32_as64 = re32.astype(np.float64) + 1j * im32.astype(np.float64)

    # referee: float64 evaluation of the f32-quantized state
    obs = ex.Observable(H, n)
    ref = float(obs.expectation(jnp.asarray(psi32_as64)))

    # device path: pure f32 double-float
    hilo = expectation_df(jnp.stack([_f32(re32), _f32(im32)]), n, H)
    got = combine_df(hilo)
    assert abs(got - ref) <= 5e-12 * max(1.0, abs(ref)), (got, ref)

    # the plain single-f32 evaluation is orders of magnitude worse
    plain = float(
        ex.expectation(jnp.asarray(psi32_as64.astype(np.complex64)), n, H)
    )
    assert abs(got - ref) < abs(plain - ref)


def test_norm_df_matches_f64():
    rng = np.random.default_rng(11)
    n = 12
    re32 = rng.standard_normal(1 << n).astype(np.float32) * 2 ** -6
    im32 = rng.standard_normal(1 << n).astype(np.float32) * 2 ** -6
    exact = (
        np.sum(re32.astype(np.float64) ** 2)
        + np.sum(im32.astype(np.float64) ** 2)
    )
    hi, lo = norm_df(jnp.stack([_f32(re32), _f32(im32)]))
    got = float(np.float64(hi) + np.float64(lo))
    np.testing.assert_allclose(got, exact, rtol=1e-12)


def test_rayleigh_cancels_norm_drift():
    """A deliberately mis-normalized f32 state: the RAW df energy scales
    with the norm error, the Rayleigh quotient does not (the mechanism
    that removes the flagship's ~1e-5 random-walk norm drift from on-chip
    readouts)."""
    nx, ny = 2, 2
    n = 2 * nx * ny
    H = jordan_wigner(fermi_hubbard(nx, ny, 1.0, 6.0, periodic=True))
    rng = np.random.default_rng(3)
    psi = rng.standard_normal(1 << n) + 1j * rng.standard_normal(1 << n)
    psi /= np.linalg.norm(psi)
    drift = 1.0 + 3e-5  # 3e-5 relative norm error
    re32 = (psi.real * drift).astype(np.float32)
    im32 = (psi.imag * drift).astype(np.float32)
    stacked = jnp.stack([_f32(re32), _f32(im32)])

    psi32 = re32.astype(np.float64) + 1j * im32.astype(np.float64)
    obs = ex.Observable(H, n)
    ref_rayleigh = float(obs.expectation(jnp.asarray(psi32))) / float(
        np.vdot(psi32, psi32).real
    )

    raw = combine_df(expectation_df(stacked, n, H))
    ray = combine_rayleigh(expectation_norm_df(stacked, n, H))
    # the quotient matches the f64 Rayleigh of the same state...
    assert abs(ray - ref_rayleigh) <= 1e-10 * max(1.0, abs(ref_rayleigh))
    # ...while the raw value carries the full 2*3e-5 relative drift
    assert abs(raw - ref_rayleigh) > 1e-5 * abs(ref_rayleigh)


def test_expectation_df_on_eigenstate_energy():
    """df energy of the exact 2x2 ground state (cast to f32) lands within
    the state-quantization floor of the true energy."""
    from qsfh_tpu.algos.base import HubbardProblem
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        p = HubbardProblem(2, 2, 1.0, 6.0, 4, 2, 2, results_root=root)
        e0, gs = p.ground_state()
    gs = np.asarray(gs)
    re32 = gs.real.astype(np.float32)
    im32 = gs.imag.astype(np.float32)
    H = jordan_wigner(fermi_hubbard(2, 2, 1.0, 6.0, periodic=True))
    hilo = expectation_df(jnp.stack([_f32(re32), _f32(im32)]), 8, H)
    got = combine_df(hilo)
    # state quantization bounds the error; the reduction itself adds ~0
    assert abs(got - e0) < 5e-6
