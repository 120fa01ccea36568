"""Mosaic lowering regression guard for every Pallas kernel.

The interpret-mode CPU tests (test_pallas.py) validate numerics but never
run the Mosaic lowering pipeline, so lowering-only rejections -- e.g. the
scalar-store-to-VMEM in the expectation chain (fixed in round 2) or the
``rev`` primitive in the original row-bit flips -- are invisible there.
``jax.jit(...).lower()`` on a TPU platform runs the full Mosaic pipeline on
the host without needing a healthy compile service, so this file catches
that bug class deterministically.  Skipped wherever no TPU platform exists
(the CPU test env); exercised by local runs against the axon tunnel and by
benchmarks/tpu_pallas.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsfh_tpu.engine.pallas_kernels import HAVE_PALLAS

pytestmark = pytest.mark.skipif(
    not HAVE_PALLAS or jax.devices()[0].platform not in ("tpu", "axon"),
    reason="needs a TPU platform for Mosaic lowering",
)

N = 12
T = 5


@pytest.fixture(scope="module")
def arrs():
    rng = np.random.default_rng(0)
    size = 1 << N
    psi = (rng.standard_normal(size) + 1j * rng.standard_normal(size)).astype(
        np.complex64
    )
    psi /= np.linalg.norm(psi)
    return {
        "psi": psi,
        "xs": rng.integers(0, size, T).astype(np.uint32),
        "zs": rng.integers(0, size, T).astype(np.uint32),
        "cre": rng.standard_normal(T).astype(np.float32),
        "cim": rng.standard_normal(T).astype(np.float32),
        "th": rng.standard_normal(T).astype(np.float32),
        "ph": np.ones(T, np.float32),
        "pz": np.zeros(T, np.float32),
    }


def _lowers(fn, *args):
    assert jax.jit(fn).lower(*args) is not None


def _lowers_abstract(fn, *shapes):
    # ShapeDtypeStruct args avoid materializing multi-MB states on the host
    assert jax.jit(fn).lower(*shapes) is not None


def test_xor_gather_lowers(arrs):
    from qsfh_tpu.engine.pallas_kernels import xor_gather_pallas

    _lowers(lambda p: xor_gather_pallas(p, N, jnp.uint32(3)), arrs["psi"])


def test_pauli_rotation_lowers(arrs):
    from qsfh_tpu.engine.pallas_kernels import pauli_rotation_pallas

    a = arrs
    _lowers(
        lambda p: pauli_rotation_pallas(
            p, N, a["xs"][0], a["zs"][0], a["th"][0], 1.0, 0.0
        ),
        a["psi"],
    )


def test_rotation_chain_lowers(arrs):
    from qsfh_tpu.engine.pallas_kernels import pauli_chain_pallas

    a = arrs
    _lowers(
        lambda p: pauli_chain_pallas(p, N, a["xs"], a["zs"], a["th"], a["ph"], a["pz"]),
        a["psi"],
    )


def test_expectation_chain_lowers(arrs):
    from qsfh_tpu.engine.pallas_kernels import expectation_chain_pallas

    a = arrs
    _lowers(
        lambda p: expectation_chain_pallas(p, N, a["xs"], a["zs"], a["cre"], a["cim"]),
        a["psi"],
    )


def test_apply_chain_lowers(arrs):
    from qsfh_tpu.engine.pallas_kernels import apply_chain_pallas

    a = arrs
    _lowers(
        lambda p: apply_chain_pallas(p, N, a["xs"], a["zs"], a["cre"], a["cim"]),
        a["psi"],
    )


def test_adjoint_chain_lowers(arrs):
    from qsfh_tpu.engine.pallas_kernels import adjoint_chain_pallas

    a = arrs
    _lowers(
        lambda p, l: adjoint_chain_pallas(
            p, l, N, a["xs"], a["zs"], a["th"], a["cre"], a["ph"], a["pz"]
        ),
        a["psi"],
        a["psi"],
    )


def test_expectation_stream_lowers():
    """HBM-streaming grouped expectation at n=20 (beyond the VMEM cap):
    gridded call, static XOR index map, per-block z-parity sign."""
    from qsfh_tpu.engine.pallas_kernels import expectation_stream_pallas

    n = 20
    rng = np.random.default_rng(1)
    T5 = 5
    xs = rng.integers(0, 1 << n, T5).astype(np.uint32)
    zs = rng.integers(0, 1 << n, T5).astype(np.uint32)
    cre = rng.standard_normal(T5).astype(np.float32)
    cim = rng.standard_normal(T5).astype(np.float32)
    psi = jax.ShapeDtypeStruct((1 << n,), jnp.complex64)
    _lowers_abstract(
        lambda p: expectation_stream_pallas(p, n, xs, zs, cre, cim), psi
    )


def test_apply_stream_lowers():
    from qsfh_tpu.engine.pallas_kernels import apply_stream_pallas

    n = 20
    rng = np.random.default_rng(2)
    T5 = 5
    xs = rng.integers(0, 1 << n, T5).astype(np.uint32)
    zs = rng.integers(0, 1 << n, T5).astype(np.uint32)
    cre = rng.standard_normal(T5).astype(np.float32)
    cim = rng.standard_normal(T5).astype(np.float32)
    psi = jax.ShapeDtypeStruct((1 << n,), jnp.complex64)
    _lowers_abstract(
        lambda p: apply_stream_pallas(p, n, xs, zs, cre, cim), psi
    )


def test_screen_chain_lowers(arrs):
    from qsfh_tpu.engine.pallas_kernels import screen_chain_pallas

    a = arrs
    _lowers(
        lambda p, w: screen_chain_pallas(
            p, w, N, a["xs"], a["zs"], a["cre"], a["cim"]
        ),
        a["psi"],
        a["psi"],
    )


def test_rotation_stream_lowers():
    """HBM-streaming rotations at n=20: local chained run + cross-block
    partner-paired rotation in one traced program."""
    from qsfh_tpu.engine.pallas_kernels import rotation_stream_pallas

    n = 20
    xs = np.asarray([0b11, 0b1100, (1 << 19) | 1, 1 << 4], np.uint32)
    zs = np.asarray([0b101, (1 << 19) | 2, 1 << 18, 0b11], np.uint32)
    ph_re = np.ones(4, np.float32)
    ph_im = np.zeros(4, np.float32)
    th = jnp.asarray([0.3, -0.2, 0.7, 0.1], jnp.float32)
    psi = jax.ShapeDtypeStruct((1 << n,), jnp.complex64)
    _lowers_abstract(
        lambda p, t: rotation_stream_pallas(p, n, xs, zs, t, ph_re, ph_im),
        psi,
        jax.ShapeDtypeStruct((4,), jnp.float32),
    )


def test_adjoint_stream_lowers():
    """HBM-streaming adjoint sweep at n=20: half-size blocks, grid-
    accumulated contribution slots, partner-paired cross terms."""
    from qsfh_tpu.engine.pallas_kernels import adjoint_stream_pallas

    n = 20
    xs = np.asarray([0b11, 0b1100, (1 << 19) | 1, 1 << 4], np.uint32)
    zs = np.asarray([0b101, (1 << 19) | 2, 1 << 18, 0b11], np.uint32)
    ones = np.ones(4, np.float32)
    zero = np.zeros(4, np.float32)
    th = jnp.asarray([0.3, -0.2, 0.7, 0.1], jnp.float32)
    psi = jax.ShapeDtypeStruct((1 << n,), jnp.complex64)
    _lowers_abstract(
        lambda p, l, t: adjoint_stream_pallas(
            p, l, n, xs, zs, t, ones, ones, zero
        ),
        psi,
        psi,
        jax.ShapeDtypeStruct((4,), jnp.float32),
    )


def test_screen_stream_lowers():
    """HBM-streaming pool screening at n=20: one-hot slot accumulation
    across grid blocks, SMEM term scalars, XOR-paired psi blocks."""
    from qsfh_tpu.engine.pallas_kernels import screen_stream_pallas

    n = 20
    rng = np.random.default_rng(3)
    T5 = 5
    xs = rng.integers(0, 1 << n, T5).astype(np.uint32)
    zs = rng.integers(0, 1 << n, T5).astype(np.uint32)
    cre = rng.standard_normal(T5).astype(np.float32)
    cim = rng.standard_normal(T5).astype(np.float32)
    psi = jax.ShapeDtypeStruct((1 << n,), jnp.complex64)
    _lowers_abstract(
        lambda p, w: screen_stream_pallas(p, w, n, xs, zs, cre, cim)[0],
        psi,
        psi,
    )
