"""Pallas TPU kernels for the hot statevector ops.

The scan-compiled engine's inner op is the XOR-gather ``t[b] = psi[b ^ m]``
with a TRACED mask m (qsfh_tpu.engine.compiled.xor_flip_traced).  Its pure-
XLA lowering is n conditional single-bit flips -- n full HBM passes per
Pauli term.  The kernel here does it in ONE pass with the statevector
resident in VMEM (a 2^18 complex64 state is 2 MB as two f32 planes; VMEM is
~16 MB):

* the mask's ROW bits (bit 7 and up of the flat index) are applied as a
  cascade of conditional axis reversals on the row axis -- each is a cheap
  VMEM shuffle, and `jnp.where` keeps it branchless;
* the mask's LANE bits (low 7 bits) become a 128x128 XOR-permutation
  matrix built in-kernel from broadcasted iotas and applied as ONE MXU
  matmul per plane.

Correctness is validated against the XLA path in tests (interpret mode on
CPU, real lowering on TPU).  Usage is opt-in via ``QSFH_PALLAS=1`` or
``use_pallas=True`` call sites until profiled on the target chip.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

LANE = 128
LANE_BITS = 7


def pallas_enabled() -> bool:
    return HAVE_PALLAS and os.environ.get("QSFH_PALLAS", "0") == "1"


def _xor_gather_kernel(mask_ref, re_ref, im_ref, ore_ref, oim_ref):
    """out[b] = in[b ^ mask] on (R, 128) f32 planes; mask is an SMEM scalar."""
    mask = mask_ref[0]
    row_mask = (mask >> np.uint32(LANE_BITS)).astype(jnp.uint32)
    lane_mask = (mask & np.uint32(LANE - 1)).astype(jnp.uint32)

    re = re_ref[:]
    im = im_ref[:]
    rows = re.shape[0]
    n_row_bits = max(rows.bit_length() - 1, 0)

    # row-bit cascade: conditional reversal per row bit
    # (reshape keeps the lane axis last: (a, 2, 2^p, LANE))
    for p in range(n_row_bits):
        a = rows >> (p + 1)  # blocks above this bit
        re4 = re.reshape(a, 2, 1 << p, LANE)
        im4 = im.reshape(a, 2, 1 << p, LANE)
        bit = (row_mask >> np.uint32(p)) & np.uint32(1)
        re = jnp.where(
            bit.astype(bool), jnp.flip(re4, axis=1), re4
        ).reshape(rows, LANE)
        im = jnp.where(
            bit.astype(bool), jnp.flip(im4, axis=1), im4
        ).reshape(rows, LANE)

    # lane-bit XOR permutation as one MXU matmul per plane
    i_ids = jax.lax.broadcasted_iota(jnp.uint32, (LANE, LANE), 0)
    j_ids = jax.lax.broadcasted_iota(jnp.uint32, (LANE, LANE), 1)
    P = ((i_ids ^ j_ids) == lane_mask).astype(jnp.float32)
    ore_ref[:] = jnp.dot(re, P, preferred_element_type=jnp.float32)
    oim_ref[:] = jnp.dot(im, P, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("n",))
def xor_gather_pallas(psi: jnp.ndarray, n: int, xb) -> jnp.ndarray:
    """t[b] = psi[b ^ xb] (traced flat mask) via the one-pass VMEM kernel.

    psi: flat (2^n,) complex64/complex128 (planes processed as f32/f64).
    Requires n >= LANE_BITS and the state to fit VMEM (n <= ~20 for c64).
    """
    if not HAVE_PALLAS:  # pragma: no cover
        raise RuntimeError("pallas unavailable")
    if n < LANE_BITS:
        raise ValueError("xor_gather_pallas needs at least 7 qubits")
    rows = (1 << n) // LANE
    re = jnp.real(psi).astype(jnp.float32).reshape(rows, LANE)
    im = jnp.imag(psi).astype(jnp.float32).reshape(rows, LANE)
    mask = jnp.asarray(xb, dtype=jnp.uint32).reshape(1)

    ore, oim = pl.pallas_call(
        _xor_gather_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=jax.devices()[0].platform == "cpu",
    )(mask, re, im)
    return (ore + 1j * oim).astype(psi.dtype).reshape(psi.shape)


def _pauli_rot_kernel(scal_ref, re_ref, im_ref, ore_ref, oim_ref):
    """Fused exp(-i theta P): ONE VMEM pass.

    scal layout: [xb, zb] uint32 in scal_ref[0:2]; [cos, sin, phre, phim]
    f32 bit-cast via separate SMEM ref would complicate the signature, so
    angle scalars ride in as float32 after the masks (bitcast from uint32).
    """
    xb = scal_ref[0]
    zb = scal_ref[1]
    cos_t = jax.lax.bitcast_convert_type(scal_ref[2], jnp.float32)
    sin_t = jax.lax.bitcast_convert_type(scal_ref[3], jnp.float32)
    phre = jax.lax.bitcast_convert_type(scal_ref[4], jnp.float32)
    phim = jax.lax.bitcast_convert_type(scal_ref[5], jnp.float32)

    re = re_ref[:]
    im = im_ref[:]
    rows = re.shape[0]
    n_row_bits = max(rows.bit_length() - 1, 0)

    row_mask = (xb >> np.uint32(LANE_BITS)).astype(jnp.uint32)
    lane_mask = (xb & np.uint32(LANE - 1)).astype(jnp.uint32)

    tre, tim = re, im
    for p in range(n_row_bits):
        a = rows >> (p + 1)
        r4 = tre.reshape(a, 2, 1 << p, LANE)
        i4 = tim.reshape(a, 2, 1 << p, LANE)
        bit = ((row_mask >> np.uint32(p)) & np.uint32(1)).astype(bool)
        tre = jnp.where(bit, jnp.flip(r4, axis=1), r4).reshape(rows, LANE)
        tim = jnp.where(bit, jnp.flip(i4, axis=1), i4).reshape(rows, LANE)

    i_ids = jax.lax.broadcasted_iota(jnp.uint32, (LANE, LANE), 0)
    j_ids = jax.lax.broadcasted_iota(jnp.uint32, (LANE, LANE), 1)
    P = ((i_ids ^ j_ids) == lane_mask).astype(jnp.float32)
    tre = jnp.dot(tre, P, preferred_element_type=jnp.float32)
    tim = jnp.dot(tim, P, preferred_element_type=jnp.float32)

    # parity sign s(b) = (-1)^{popcount(b & zb)}
    row_ids = jax.lax.broadcasted_iota(jnp.uint32, (rows, LANE), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.uint32, (rows, LANE), 1)
    b = (row_ids << np.uint32(LANE_BITS)) | lane_ids
    par = jax.lax.population_count(b & zb) & np.uint32(1)
    s = 1.0 - 2.0 * par.astype(jnp.float32)

    # ppsi = ph * s * t  (complex);  out = cos*psi - i*sin*ppsi
    pre = s * (phre * tre - phim * tim)
    pim = s * (phre * tim + phim * tre)
    ore_ref[:] = cos_t * re + sin_t * pim
    oim_ref[:] = cos_t * im - sin_t * pre


@functools.partial(jax.jit, static_argnames=("n",))
def pauli_rotation_pallas(psi, n: int, xb, zb, theta, phre, phim):
    """exp(-i theta P)|psi> fused in one VMEM-resident pallas pass.

    Matches engine.compiled's rot-scan body semantics: P|psi> =
    (phre + i phim) * sign_z(b) * psi[b ^ xb].
    """
    if n < LANE_BITS:
        raise ValueError("pauli_rotation_pallas needs at least 7 qubits")
    rows = (1 << n) // LANE
    re = jnp.real(psi).astype(jnp.float32).reshape(rows, LANE)
    im = jnp.imag(psi).astype(jnp.float32).reshape(rows, LANE)
    theta = jnp.asarray(theta, jnp.float32)
    scal = jnp.stack(
        [
            jnp.asarray(xb, jnp.uint32),
            jnp.asarray(zb, jnp.uint32),
            jax.lax.bitcast_convert_type(jnp.cos(theta), jnp.uint32),
            jax.lax.bitcast_convert_type(jnp.sin(theta), jnp.uint32),
            jax.lax.bitcast_convert_type(jnp.asarray(phre, jnp.float32), jnp.uint32),
            jax.lax.bitcast_convert_type(jnp.asarray(phim, jnp.float32), jnp.uint32),
        ]
    )
    ore, oim = pl.pallas_call(
        _pauli_rot_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=jax.devices()[0].platform == "cpu",
    )(scal, re, im)
    return (ore + 1j * oim).astype(psi.dtype).reshape(psi.shape)
