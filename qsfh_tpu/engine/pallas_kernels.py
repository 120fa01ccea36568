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
CPU) and ON THE REAL CHIP (benchmarks/tpu_pallas.py: bit-exact, fastest
lowering).  Default ON for TPU backends, opt-in elsewhere
(``QSFH_PALLAS=1/0`` overrides; ``QSFH_PALLAS_MAX_N`` caps the
VMEM-resident chain kernels, default 18 qubits).
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
    """Default ON for accelerator backends, OFF on CPU.

    Data-backed (benchmarks/tpu_pallas.json, real v5e chip, 18 qubits):
    the fused rotation kernel is bit-exact vs the XLA lane-matmul path and
    ~15% faster (479 vs 563 us/rotation).  On CPU the kernels only run in
    interpret mode (orders of magnitude slower), so they stay opt-in there.
    ``QSFH_PALLAS=1/0`` overrides either way.
    """
    if not HAVE_PALLAS:
        return False
    env = os.environ.get("QSFH_PALLAS")
    if env is not None:
        return env == "1"
    try:
        # TPU-only: these kernels are Mosaic (pltpu memory spaces); a CUDA
        # backend would fail to lower them, and CPU only has interpret mode
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def adjoint_chain_max_qubits() -> int:
    """VMEM cap for the ADJOINT chain kernel.

    The adjoint sweep keeps the most planes resident (psi + lambda inputs,
    carried pair, per-term accumulators); with the original 3-pass HIGHEST
    permutation matmuls it needed 19.3 MB scoped VMEM at n=18 vs the 16 MB
    v5e limit (measured AOT OOM, 2026-08-17) so the cap sat at 17.  The
    round-3 separable sign planes removed the extra resident planes and the
    n=18 chain now fits on the real chip: benchmarks/tpu_adj18.json
    (2026-08-20, v5e) shows fit=true, grad parity 2.1e-9 vs the f64 host
    sweep, 51 us/term over a 1280-term chain.  At ``n`` above this cap the
    HBM-streaming adjoint takes over.  ``QSFH_PALLAS_ADJ_MAX_N`` overrides.
    """
    return min(
        chain_max_qubits(), int(os.environ.get("QSFH_PALLAS_ADJ_MAX_N", "18"))
    )


def chain_max_qubits() -> int:
    """Largest n the VMEM-resident chain kernels accept.

    The adjoint/screen chains keep 4 input + 4-5 output planes plus
    _xor_permute temporaries resident; at n=18 that is ~10-12 MB of the
    ~16 MB v5e VMEM, at n=19 it no longer fits.  ``QSFH_PALLAS_MAX_N``
    overrides (e.g. larger-VMEM parts)."""
    return int(os.environ.get("QSFH_PALLAS_MAX_N", "18"))


def _xor_matrix(size: int, mask) -> jnp.ndarray:
    """(size, size) XOR-permutation matrix P[i, j] = (i ^ j == mask).

    Symmetric (i^j == j^i), built from 2-D iotas -- the only index machinery
    Mosaic is guaranteed to lower.
    """
    i_ids = jax.lax.broadcasted_iota(jnp.uint32, (size, size), 0)
    j_ids = jax.lax.broadcasted_iota(jnp.uint32, (size, size), 1)
    return ((i_ids ^ j_ids) == mask).astype(jnp.float32)


def _xor_permute(x, mask, rows: int):
    """out[b] = x[b ^ mask] on an (rows, LANE) f32 plane.

    Three XOR-permutation matmuls: lane bits (low 7), mid row bits, top row
    bits.  The earlier row-bit reversal cascade used ``jnp.flip`` -- the
    ``rev`` primitive, which Mosaic does NOT lower on TPU (discovered on the
    real chip, round 2); iota-compare + MXU matmul + minor-dim transpose all
    do.
    """
    if _permute_v2():
        return _xor_permute_swaps(x, mask, rows)
    # precision=HIGHEST is load-bearing: the MXU's default f32 matmul
    # truncates inputs to bf16 (measured on-chip: per-element permutation
    # error up to 1.6e-2, benchmarks/tpu_op_probe.jsonl), which corrupted
    # every chained rotation by ~1e-3 and the 18q fused-step energy by
    # 6e-3.  With a 0/1 permutation matrix the multi-pass HIGHEST algorithm
    # reproduces exact f32 selection.
    _PREC = jax.lax.Precision.HIGHEST
    lane_mask = (mask & np.uint32(LANE - 1)).astype(jnp.uint32)
    row_mask = (mask >> np.uint32(LANE_BITS)).astype(jnp.uint32)
    x = jnp.dot(x, _xor_matrix(LANE, lane_mask),
                preferred_element_type=jnp.float32, precision=_PREC)
    m = min(LANE, rows)
    s = rows // m
    mid_mask = row_mask & np.uint32(m - 1)
    x3 = x.reshape(s, m, LANE)
    y = jnp.swapaxes(x3, 1, 2)  # (s, LANE, m) -- minor-dim transpose
    y = jnp.dot(y, _xor_matrix(m, mid_mask),
                preferred_element_type=jnp.float32, precision=_PREC)
    x3 = jnp.swapaxes(y, 1, 2)
    if s > 1:
        top_mask = (row_mask >> np.uint32(m.bit_length() - 1)).astype(jnp.uint32)
        x2 = x3.reshape(s, m * LANE)
        x2 = jax.lax.dot_general(
            _xor_matrix(s, top_mask),
            x2,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_PREC,
        )
        x3 = x2.reshape(s, m, LANE)
    return x3.reshape(rows, LANE)


def _permute_v2() -> bool:
    """Swap-based dynamic permute (QSFH_PERMUTE_V2=1): lane matmul +
    traced (8,8) sublane matmul + per-bit CONDITIONAL static half-swaps
    for row bits >= 3, instead of the three full XOR matmuls.  ~2x fewer
    MXU flops and fewer live temporaries per permute; opt-in until
    validated on-chip (the adjoint chain's 19.3 MB VMEM overrun at n=18
    is matmul-temporary dominated)."""
    return os.environ.get("QSFH_PERMUTE_V2", "0") == "1"


def _xor_permute_swaps(x, mask, rows: int):
    """out[b] = x[b ^ mask] with a TRACED mask, swap-based row handling.

    The mask VALUE is runtime data but every bit POSITION is static, so
    row bits >= 3 lower to `where(bit, static_half_swap(x), x)` -- a VMEM
    copy + select, zero MXU flops.  Row bits 0-2 ride one (8, 8) XOR
    matmul (matrix built by iota-compare against the traced low bits);
    lane bits keep the 128x128 matmul (the only true lane shuffle)."""
    prec = jax.lax.Precision.HIGHEST
    lane_mask = (mask & np.uint32(LANE - 1)).astype(jnp.uint32)
    row_mask = (mask >> np.uint32(LANE_BITS)).astype(jnp.uint32)
    x = jnp.dot(x, _xor_matrix(LANE, lane_mask),
                preferred_element_type=jnp.float32, precision=prec)
    if rows < 8:
        raise ValueError("swap permute needs >= 8 rows")
    g = rows // 8
    x3 = x.reshape(g, 8, LANE)
    y = jnp.swapaxes(x3, 1, 2)
    y = jnp.dot(y, _xor_matrix(8, row_mask & np.uint32(7)),
                preferred_element_type=jnp.float32, precision=prec)
    x = jnp.swapaxes(y, 1, 2).reshape(rows, LANE)
    nbits = rows.bit_length() - 1
    for t in range(3, nbits):
        c = 1 << t
        a = rows // (2 * c)
        x4 = x.reshape(a, 2, c, LANE)
        sw = jnp.concatenate([x4[:, 1:2], x4[:, 0:1]], axis=1)
        bit = (row_mask >> np.uint32(t)) & np.uint32(1)
        x4 = jnp.where(bit > np.uint32(0), sw, x4)
        x = x4.reshape(rows, LANE)
    return x


def _stream_roll_enabled() -> bool:
    """Roll+select lowering for the static XOR permutes (QSFH_STREAM_ROLL).

    The matmul lowering costs rows*128*128*2 MXU flops per lane-bit
    permute (x3 at HIGHEST precision) plus a minor-dim transpose for row
    bits; the round-4 probe measured the 26q fused-static eval pinned at
    ~32 ms regardless of traffic knobs while plain XLA streams the same
    chip at 910 GB/s (tpu_hbm_peak.json) -- MXU/relayout-bound, not HBM.
    Roll+select does each bit's XOR as 2 static lane/sublane rotates + a
    select: pure VPU, ~3 plane ops per set bit.  Default ON since the
    26q chip A/B (tpu_fusedstatic_probe.json: fused-static one-call
    34.8 -> 12.6 ms/eval, rel err unchanged at 2e-6); QSFH_STREAM_ROLL=0
    restores the matmul lowering.
    """
    return os.environ.get("QSFH_STREAM_ROLL", "1") == "1"


def _xor_roll(x, mask: int, axis: int):
    """out[..i..] = x[..i ^ mask..] along ``axis`` via per-bit
    roll+select (static shifts lower to Mosaic rotates, no MXU)."""
    mask = int(mask)
    if mask == 0:
        return x
    size = x.shape[axis]
    ids = jax.lax.broadcasted_iota(jnp.uint32, x.shape, axis)
    b = 1
    while mask:
        if mask & b:
            # shifts must be non-negative: -b == size - b (mod size)
            lo = pltpu.roll(x, size - b, axis)  # out[i] = x[i + b]
            hi = pltpu.roll(x, b, axis)         # out[i] = x[i - b]
            x = jnp.where((ids & np.uint32(b)) == 0, lo, hi)
            mask ^= b
        b <<= 1
    return x


def _xor_permute_static(x, mask: int, rows: int):
    """out[b] = x[b ^ mask] on an (rows, LANE) f32 plane, HOST-static mask.

    The dynamic :func:`_xor_permute` must run all three XOR matmuls
    unconditionally (its mask is kernel data), costing ~500 MXU flops per
    element per term -- the measured reason the streaming sizes sit at
    4-6%% of HBM peak (benchmarks/tpu_utilization.json).  With the mask
    known at trace time (the streaming kernels' masks ARE host numpy),
    every identity piece is skipped and the row-bit pieces lower to
    cheaper forms:

    * lane bits (low 7): one 128x128 XOR matmul -- only when nonzero;
    * row bits 0-2 (sublane strides 1/2/4): one (8, 8) XOR matmul on the
      minor-transposed plane (the transpose+matmul pattern already proven
      on-chip for the dynamic mid-bit piece, just 16x smaller);
    * row bits >= 3: per-set-bit half swaps via STATIC slice+concat on
      8-row-aligned chunks (pure VMEM data movement, zero flops).
    """
    mask = int(mask)
    if mask == 0:
        return x
    if _stream_roll_enabled():
        lane_mask = mask & (LANE - 1)
        row_mask = mask >> LANE_BITS
        x = _xor_roll(x, lane_mask, 1)
        return _xor_roll(x, row_mask, 0)
    prec = jax.lax.Precision.HIGHEST
    lane_mask = mask & (LANE - 1)
    row_mask = mask >> LANE_BITS
    if lane_mask:
        x = jnp.dot(x, _xor_matrix(LANE, np.uint32(lane_mask)),
                    preferred_element_type=jnp.float32, precision=prec)
    # row bits use the SAME mid/top transpose+matmul forms as the proven
    # dynamic path, just statically SKIPPED when their mask zone is zero.
    # (An earlier slice+concat half-swap formulation was zero-flop on
    # paper but Mosaic relayouts materialized whole planes in vregs --
    # 220 MB of register spills at 24q, measured on-chip 2026-08-19.)
    m = min(LANE, rows)
    s = rows // m
    mid_mask = row_mask & (m - 1)
    if mid_mask:
        x3 = x.reshape(s, m, LANE)
        y = jnp.swapaxes(x3, 1, 2)  # (s, LANE, m) -- minor-dim transpose
        y = jnp.dot(y, _xor_matrix(m, np.uint32(mid_mask)),
                    preferred_element_type=jnp.float32, precision=prec)
        x = jnp.swapaxes(y, 1, 2).reshape(rows, LANE)
    top_mask = row_mask >> (m.bit_length() - 1)
    if s > 1 and top_mask:
        x2 = x.reshape(s, m * LANE)
        x2 = jax.lax.dot_general(
            _xor_matrix(s, np.uint32(top_mask)),
            x2,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        x = x2.reshape(rows, LANE)
    return x


def _parity_sign_static(zb: int, rows: int):
    """s(b) = (-1)^{popcount(b & zb)} with a HOST-static z mask.

    Returns None for zb == 0 (all +1) so callers can skip the multiply;
    otherwise XORs only the SET bits of zb (the dynamic form loops over
    all n bits)."""
    zb = int(zb)
    if zb == 0:
        return None
    row_ids = jax.lax.broadcasted_iota(jnp.uint32, (rows, LANE), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.uint32, (rows, LANE), 1)
    b = (row_ids << np.uint32(LANE_BITS)) | lane_ids
    par = jnp.zeros((rows, LANE), jnp.uint32)
    t = 0
    while zb:
        if zb & 1:
            par = par ^ ((b >> np.uint32(t)) & np.uint32(1))
        zb >>= 1
        t += 1
    return jnp.where(par > np.uint32(0), jnp.float32(-1.0), jnp.float32(1.0))


def _block_sign_static(zhi: int, i):
    """(-1)^{popcount(zhi & block_index)} as a traced f32 scalar; zhi is
    HOST-static so only its set bits cost ops.  Returns None for zhi == 0."""
    zhi = int(zhi)
    if zhi == 0:
        return None
    par = jnp.int32(0)
    t = 0
    while zhi:
        if zhi & 1:
            par = par ^ ((i >> np.int32(t)) & np.int32(1))
        zhi >>= 1
        t += 1
    return jnp.where(par > 0, jnp.float32(-1.0), jnp.float32(1.0))


def _parity_sign(zb, rows: int):
    """s(b) = (-1)^{popcount(b & zb)} on the (rows, LANE) index grid.

    SEPARABLE: s(b) = srow(row bits of b) * slane(lane bits of b), so the
    parity bit-loops run on a (rows, 1) column and a (1, LANE) row -- tiny
    VPU work -- and the full plane costs ONE broadcast multiply.  The
    earlier joint form ran the (log2(rows) + 7)-bit loop on all
    (rows, LANE) elements: ~3 ops/bit/element, ~50 full-plane ops per
    term, which dominated every SMEM-data kernel's VPU time (chain
    rotations, dynamic streaming, screening).  Bit-loop XOR instead of
    ``lax.population_count`` (unproven in Mosaic)."""
    zb = jnp.asarray(zb, jnp.uint32)
    row_ids = jax.lax.broadcasted_iota(jnp.uint32, (rows, 1), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.uint32, (1, LANE), 1)
    rmask = row_ids & (zb >> np.uint32(LANE_BITS))
    lmask = lane_ids & (zb & np.uint32(LANE - 1))
    rpar = jnp.zeros((rows, 1), jnp.uint32)
    for t in range(rows.bit_length() - 1):
        rpar = rpar ^ ((rmask >> np.uint32(t)) & np.uint32(1))
    lpar = jnp.zeros((1, LANE), jnp.uint32)
    for t in range(LANE_BITS):
        lpar = lpar ^ ((lmask >> np.uint32(t)) & np.uint32(1))
    # uint32 -> float32 casts don't lower in Mosaic; select on a bool does
    srow = jnp.where(rpar > np.uint32(0), jnp.float32(-1.0), jnp.float32(1.0))
    slane = jnp.where(lpar > np.uint32(0), jnp.float32(-1.0), jnp.float32(1.0))
    return srow * slane


def _block_parity_flip(s, zhi_j, i, nhi):
    """Flip a sign tile when parity(zhi & block_index) is odd.

    The z mask's block bits contribute one scalar sign per (term, block):
    the streaming kernels all fold it the same way (this helper replaced
    nine inline copies)."""
    hi = zhi_j & i
    par = jnp.int32(0)
    for t in range(nhi):
        par = par ^ ((hi >> np.int32(t)) & np.int32(1))
    return jnp.where(par > 0, -s, s)


def _xor_gather_kernel(mask_ref, re_ref, im_ref, ore_ref, oim_ref):
    """out[b] = in[b ^ mask] on (R, 128) f32 planes; mask is an SMEM scalar."""
    mask = mask_ref[0]
    rows = re_ref.shape[0]
    ore_ref[:] = _xor_permute(re_ref[:], mask, rows)
    oim_ref[:] = _xor_permute(im_ref[:], mask, rows)


@functools.partial(jax.jit, static_argnames=("n",))
def xor_gather_pallas(psi: jnp.ndarray, n: int, xb) -> jnp.ndarray:
    """t[b] = psi[b ^ xb] (traced flat mask) via the one-pass VMEM kernel.

    psi: flat (2^n,) complex64 ONLY -- the kernel processes f32 planes, so
    a complex128 input would be silently truncated; it is rejected instead
    (use the XLA path for f64).  Requires n >= 10 and the state to fit
    VMEM (n <= ~20 for c64).
    """
    if not HAVE_PALLAS:  # pragma: no cover
        raise RuntimeError("pallas unavailable")
    if psi.dtype != jnp.complex64:
        raise ValueError(
            f"xor_gather_pallas processes f32 planes (complex64 input); "
            f"got {psi.dtype}"
        )
    if n < 10:
        # rows = 2^(n-7) >= 8 keeps the (8, 128) sublane/lane tile intact
        raise ValueError("xor_gather_pallas needs at least 10 qubits")
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


def _pauli_chain_kernel(
    xs_ref, zs_ref, cos_ref, sin_ref, phre_ref, phim_ref, re_ref, im_ref,
    ore_ref, oim_ref,
):
    """A CHAIN of fused Pauli rotations with the state VMEM-resident.

    The per-term kernel round-trips the two f32 planes through HBM once per
    rotation; this kernel streams T terms (scalar arrays in SMEM) over a
    state that never leaves VMEM -- HBM traffic drops from 2*T to 2 plane
    transfers per call.  Term i: exp(-i theta_i P_i) with
    P_i = (phre_i + i phim_i) * sign_z(b) * flip_x(b).
    """
    rows = re_ref.shape[0]
    T = xs_ref.shape[0]

    def body(i, carry):
        re, im = carry
        xb = xs_ref[i]
        zb = zs_ref[i]
        c = cos_ref[i]
        sn = sin_ref[i]
        pr = phre_ref[i]
        pi = phim_ref[i]
        tre = _xor_permute(re, xb, rows)
        tim = _xor_permute(im, xb, rows)
        s = _parity_sign(zb, rows)
        pre = s * (pr * tre - pi * tim)
        pim = s * (pr * tim + pi * tre)
        return (c * re + sn * pim, c * im - sn * pre)

    re, im = jax.lax.fori_loop(0, T, body, (re_ref[:], im_ref[:]))
    ore_ref[:] = re
    oim_ref[:] = im


# terms per kernel call: 6 SMEM scalar arrays x 4 B x CHUNK must stay well
# inside scalar memory; identity-padded chunks compose longer chains
CHAIN_CHUNK = 256


def _chunk_loop(body, carry, chunks, n_chunks):
    """Run a scan-style body once per chunk, UNROLLED for small counts.

    The remote TPU compile service takes ~150 s to compile a lax.scan
    whose body contains a pallas call, while the same calls unrolled
    compile in seconds (benchmarks/tpu_bisect_basis.jsonl: chain_scan2
    156.5 s vs chain_pallas 5.0 s).  Realistic circuits have <= a few
    chunks, so unrolling costs little program size; very long chains
    fall back to the scan.
    """
    if n_chunks <= int(os.environ.get("QSFH_PALLAS_UNROLL_CHUNKS", "16")):
        ys = []
        for c in range(n_chunks):
            carry, y = body(carry, tuple(a[c] for a in chunks))
            if y is not None:
                ys.append(y)
        return carry, (jnp.stack(ys) if ys else None)
    return jax.lax.scan(body, carry, chunks)


@functools.partial(jax.jit, static_argnames=("n",))
def pauli_chain_pallas(psi, n: int, xs, zs, thetas, phre, phim):
    """Apply exp(-i theta_T P_T) ... exp(-i theta_0 P_0) |psi> in chunks of
    VMEM-resident chained rotations.

    ``thetas`` carries the full signed per-term angle (scale and direction
    already folded in).  Chains longer than CHAIN_CHUNK are identity-padded
    (theta=0) and processed by an outer scan over chunks.
    """
    if n < 10:
        raise ValueError("pauli_chain_pallas needs at least 10 qubits")
    rows = (1 << n) // LANE
    re = jnp.real(psi).astype(jnp.float32).reshape(rows, LANE)
    im = jnp.imag(psi).astype(jnp.float32).reshape(rows, LANE)

    T = xs.shape[0]
    chunk = CHAIN_CHUNK if T > CHAIN_CHUNK else max(T, 1)
    pad = (-T) % chunk
    xs = jnp.pad(jnp.asarray(xs, jnp.uint32), (0, pad))
    zs = jnp.pad(jnp.asarray(zs, jnp.uint32), (0, pad))
    thetas = jnp.pad(jnp.asarray(thetas, jnp.float32), (0, pad))
    phre = jnp.pad(jnp.asarray(phre, jnp.float32), (0, pad), constant_values=1.0)
    phim = jnp.pad(jnp.asarray(phim, jnp.float32), (0, pad))
    n_chunks = (T + pad) // chunk

    call = pl.pallas_call(
        _pauli_chain_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 6
        + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=jax.devices()[0].platform == "cpu",
    )

    def chunk_body(carry, term):
        cre, cim = carry
        cxs, czs, cth, cpr, cpi = term
        nre, nim = call(cxs, czs, jnp.cos(cth), jnp.sin(cth), cpr, cpi, cre, cim)
        return (nre, nim), None

    chunks = (
        xs.reshape(n_chunks, chunk),
        zs.reshape(n_chunks, chunk),
        thetas.reshape(n_chunks, chunk),
        phre.reshape(n_chunks, chunk),
        phim.reshape(n_chunks, chunk),
    )
    (re, im), _ = _chunk_loop(chunk_body, (re, im), chunks, n_chunks)
    return (re + 1j * im).astype(psi.dtype).reshape(psi.shape)


def _pauli_rot_kernel(mask_ref, ang_ref, re_ref, im_ref, ore_ref, oim_ref):
    """Fused exp(-i theta P): ONE VMEM pass.

    mask_ref: [xb, zb] uint32 SMEM; ang_ref: [cos, sin, phre, phim] f32
    SMEM.  (Scalar ``bitcast_convert_type`` does not lower in Mosaic --
    ``tpu.bitcast`` wants vectors -- so the scalars ride in typed refs.)
    """
    xb = mask_ref[0]
    zb = mask_ref[1]
    cos_t = ang_ref[0]
    sin_t = ang_ref[1]
    phre = ang_ref[2]
    phim = ang_ref[3]

    re = re_ref[:]
    im = im_ref[:]
    rows = re.shape[0]

    tre = _xor_permute(re, xb, rows)
    tim = _xor_permute(im, xb, rows)
    s = _parity_sign(zb, rows)

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
    if n < 10:
        raise ValueError("pauli_rotation_pallas needs at least 10 qubits")
    rows = (1 << n) // LANE
    re = jnp.real(psi).astype(jnp.float32).reshape(rows, LANE)
    im = jnp.imag(psi).astype(jnp.float32).reshape(rows, LANE)
    theta = jnp.asarray(theta, jnp.float32)
    masks = jnp.stack(
        [jnp.asarray(xb, jnp.uint32), jnp.asarray(zb, jnp.uint32)]
    )
    angs = jnp.stack(
        [
            jnp.cos(theta),
            jnp.sin(theta),
            jnp.asarray(phre, jnp.float32),
            jnp.asarray(phim, jnp.float32),
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
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=jax.devices()[0].platform == "cpu",
    )(masks, angs, re, im)
    return (ore + 1j * oim).astype(psi.dtype).reshape(psi.shape)


def _expectation_chain_kernel(
    xs_ref, zs_ref, cre_ref, cim_ref, re_ref, im_ref, out_ref
):
    """acc += Re[c_t <psi| s_z P_t |psi>] over T terms, state VMEM-resident.

    Per term: val = sum_b conj(psi)[b] * s(b) * psi[b ^ xb];  in planes
    val_re = sum s*(re*tre + im*tim), val_im = sum s*(re*tim - im*tre);
    contribution cre*val_re - cim*val_im.  Zero-coefficient padding terms
    contribute exactly 0.
    """
    rows = re_ref.shape[0]
    T = xs_ref.shape[0]
    re = re_ref[:]
    im = im_ref[:]

    def body(i, acc):
        tre = _xor_permute(re, xs_ref[i], rows)
        tim = _xor_permute(im, xs_ref[i], rows)
        s = _parity_sign(zs_ref[i], rows)
        vr = jnp.sum(s * (re * tre + im * tim))
        vi = jnp.sum(s * (re * tim - im * tre))
        return acc + cre_ref[i] * vr - cim_ref[i] * vi

    acc = jax.lax.fori_loop(0, T, body, jnp.float32(0.0))
    # Mosaic cannot store a scalar to VMEM; broadcast over a full (8, LANE)
    # tile (the proven full-plane store pattern) and let the caller read [0,0]
    out_ref[:] = jnp.zeros((8, LANE), jnp.float32) + acc


@functools.partial(jax.jit, static_argnames=("n",))
def expectation_chain_pallas(psi, n: int, xs, zs, cre, cim):
    """Re <psi| sum_t c_t s_z P_t |psi> with the state VMEM-resident."""
    if n < 10:
        raise ValueError("expectation_chain_pallas needs at least 10 qubits")
    rows = (1 << n) // LANE
    re = jnp.real(psi).astype(jnp.float32).reshape(rows, LANE)
    im = jnp.imag(psi).astype(jnp.float32).reshape(rows, LANE)

    T = xs.shape[0]
    chunk = CHAIN_CHUNK if T > CHAIN_CHUNK else max(T, 1)
    pad = (-T) % chunk
    xs = jnp.pad(jnp.asarray(xs, jnp.uint32), (0, pad))
    zs = jnp.pad(jnp.asarray(zs, jnp.uint32), (0, pad))
    cre = jnp.pad(jnp.asarray(cre, jnp.float32), (0, pad))
    cim = jnp.pad(jnp.asarray(cim, jnp.float32), (0, pad))
    n_chunks = (T + pad) // chunk

    call = pl.pallas_call(
        _expectation_chain_kernel,
        out_shape=jax.ShapeDtypeStruct((8, LANE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
        + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.devices()[0].platform == "cpu",
    )

    def chunk_body(acc, term):
        cxs, czs, ccr, cci = term
        return acc + call(cxs, czs, ccr, cci, re, im)[0, 0], None

    chunks = (
        xs.reshape(n_chunks, chunk),
        zs.reshape(n_chunks, chunk),
        cre.reshape(n_chunks, chunk),
        cim.reshape(n_chunks, chunk),
    )
    total, _ = _chunk_loop(chunk_body, jnp.float32(0.0), chunks, n_chunks)
    return total


def _apply_chain_kernel(
    xs_ref, zs_ref, cre_ref, cim_ref, re_ref, im_ref, are_ref, aim_ref,
    ore_ref, oim_ref,
):
    """acc += sum_t c_t s_z P_t |psi>, state and accumulator VMEM-resident."""
    rows = re_ref.shape[0]
    T = xs_ref.shape[0]
    re = re_ref[:]
    im = im_ref[:]

    def body(i, carry):
        ar, ai = carry
        tre = _xor_permute(re, xs_ref[i], rows)
        tim = _xor_permute(im, xs_ref[i], rows)
        s = _parity_sign(zs_ref[i], rows)
        cr = cre_ref[i]
        ci = cim_ref[i]
        ar = ar + s * (cr * tre - ci * tim)
        ai = ai + s * (cr * tim + ci * tre)
        return (ar, ai)

    ar, ai = jax.lax.fori_loop(0, T, body, (are_ref[:], aim_ref[:]))
    ore_ref[:] = ar
    oim_ref[:] = ai


@functools.partial(jax.jit, static_argnames=("n",))
def apply_chain_pallas(psi, n: int, xs, zs, cre, cim):
    """(sum_t c_t s_z P_t)|psi> with state + accumulator VMEM-resident."""
    if n < 10:
        raise ValueError("apply_chain_pallas needs at least 10 qubits")
    rows = (1 << n) // LANE
    re = jnp.real(psi).astype(jnp.float32).reshape(rows, LANE)
    im = jnp.imag(psi).astype(jnp.float32).reshape(rows, LANE)

    T = xs.shape[0]
    chunk = CHAIN_CHUNK if T > CHAIN_CHUNK else max(T, 1)
    pad = (-T) % chunk
    xs = jnp.pad(jnp.asarray(xs, jnp.uint32), (0, pad))
    zs = jnp.pad(jnp.asarray(zs, jnp.uint32), (0, pad))
    cre = jnp.pad(jnp.asarray(cre, jnp.float32), (0, pad))
    cim = jnp.pad(jnp.asarray(cim, jnp.float32), (0, pad))
    n_chunks = (T + pad) // chunk

    call = pl.pallas_call(
        _apply_chain_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=jax.devices()[0].platform == "cpu",
    )

    def chunk_body(carry, term):
        ar, ai = carry
        cxs, czs, ccr, cci = term
        return call(cxs, czs, ccr, cci, re, im, ar, ai), None

    chunks = (
        xs.reshape(n_chunks, chunk),
        zs.reshape(n_chunks, chunk),
        cre.reshape(n_chunks, chunk),
        cim.reshape(n_chunks, chunk),
    )
    zero = jnp.zeros((rows, LANE), jnp.float32)
    (ar, ai), _ = _chunk_loop(chunk_body, (zero, zero), chunks, n_chunks)
    return (ar + 1j * ai).astype(psi.dtype).reshape(psi.shape)


def _adjoint_chain_kernel(
    xs_ref, zs_ref, cos_ref, sin_ref, scale_ref, phre_ref, phim_ref,
    re_ref, im_ref, lre_ref, lim_ref,
    ore_ref, oim_ref, olre_ref, olim_ref, acc_ref,
):
    """Reverse adjoint sweep over T terms, four planes VMEM-resident.

    Terms arrive already REVERSED.  Per term (matching
    engine.compiled.run_rot_adjoint): contribution
    scale * Im<lam| P psi> at the post-gate state, then BOTH carriers are
    inverse-rotated exp(+i angle P).  Contributions land in a per-term
    one-hot slot of an (8, LANE) accumulator (no dynamic stores); the
    caller segment-sums them by parameter index.
    """
    rows = re_ref.shape[0]
    T = xs_ref.shape[0]
    # int32 iotas: the fori_loop index is int32 and int->uint casts are
    # themselves a Mosaic lowering risk
    slot_row = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
    slot_lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 1)
    slot_id = (slot_row << np.int32(LANE_BITS)) | slot_lane

    def body(i, carry):
        re, im, lre, lim, acc = carry
        xb = xs_ref[i]
        zb = zs_ref[i]
        c = cos_ref[i]
        sn = sin_ref[i]
        pr = phre_ref[i]
        pi = phim_ref[i]
        s = _parity_sign(zb, rows)
        tre = _xor_permute(re, xb, rows)
        tim = _xor_permute(im, xb, rows)
        pre = s * (pr * tre - pi * tim)
        pim = s * (pr * tim + pi * tre)
        contrib = scale_ref[i] * jnp.sum(lre * pim - lim * pre)
        acc = acc + contrib * jnp.where(
            slot_id == i, jnp.float32(1.0), jnp.float32(0.0)
        )
        re, im = c * re - sn * pim, c * im + sn * pre
        tlre = _xor_permute(lre, xb, rows)
        tlim = _xor_permute(lim, xb, rows)
        plre = s * (pr * tlre - pi * tlim)
        plim = s * (pr * tlim + pi * tlre)
        lre, lim = c * lre - sn * plim, c * lim + sn * plre
        return (re, im, lre, lim, acc)

    acc0 = jnp.zeros((8, LANE), jnp.float32)
    re, im, lre, lim, acc = jax.lax.fori_loop(
        0, T, body, (re_ref[:], im_ref[:], lre_ref[:], lim_ref[:], acc0)
    )
    ore_ref[:] = re
    oim_ref[:] = im
    olre_ref[:] = lre
    olim_ref[:] = lim
    acc_ref[:] = acc


# adjoint chunks are capped by the (8, LANE) one-hot contribution grid
ADJOINT_CHUNK = 256


@functools.partial(jax.jit, static_argnames=("n",))
def adjoint_chain_pallas(psi_final, lam, n: int, xs, zs, angles, scales, phre, phim):
    """Chained reverse adjoint sweep; returns (psi0, lam0, contribs).

    ``xs/zs/angles/scales/phre/phim`` must already be in REVERSED
    application order (as run_rot_adjoint prepares them); ``contribs[i]``
    is scale_i * Im<lam|P_i psi> for reversed term i -- the caller
    segment-sums by parameter index.  Four planes stay VMEM-resident per
    chunk; zero-scale padding terms contribute exactly 0 and rotate by
    identity (angle 0).
    """
    if n < 10:
        raise ValueError("adjoint_chain_pallas needs at least 10 qubits")
    if xs.shape[0] == 0:
        # empty sweep: nothing to undo, no contributions
        return psi_final, lam, jnp.zeros((0,), jnp.float32)
    rows = (1 << n) // LANE
    re = jnp.real(psi_final).astype(jnp.float32).reshape(rows, LANE)
    im = jnp.imag(psi_final).astype(jnp.float32).reshape(rows, LANE)
    lre = jnp.real(lam).astype(jnp.float32).reshape(rows, LANE)
    lim = jnp.imag(lam).astype(jnp.float32).reshape(rows, LANE)

    T = xs.shape[0]
    chunk = ADJOINT_CHUNK if T > ADJOINT_CHUNK else max(T, 1)
    pad = (-T) % chunk
    xs = jnp.pad(jnp.asarray(xs, jnp.uint32), (0, pad))
    zs = jnp.pad(jnp.asarray(zs, jnp.uint32), (0, pad))
    angles = jnp.pad(jnp.asarray(angles, jnp.float32), (0, pad))
    scales = jnp.pad(jnp.asarray(scales, jnp.float32), (0, pad))
    phre = jnp.pad(jnp.asarray(phre, jnp.float32), (0, pad), constant_values=1.0)
    phim = jnp.pad(jnp.asarray(phim, jnp.float32), (0, pad))
    n_chunks = (T + pad) // chunk

    call = pl.pallas_call(
        _adjoint_chain_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((8, LANE), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 7
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(5)),
        interpret=jax.devices()[0].platform == "cpu",
    )

    def chunk_body(carry, term):
        cre, cim, clre, clim = carry
        cxs, czs, cth, csc, cpr, cpi = term
        nre, nim, nlre, nlim, acc = call(
            cxs, czs, jnp.cos(cth), jnp.sin(cth), csc, cpr, cpi,
            cre, cim, clre, clim,
        )
        return (nre, nim, nlre, nlim), acc.reshape(-1)[:chunk]

    chunks = (
        xs.reshape(n_chunks, chunk),
        zs.reshape(n_chunks, chunk),
        angles.reshape(n_chunks, chunk),
        scales.reshape(n_chunks, chunk),
        phre.reshape(n_chunks, chunk),
        phim.reshape(n_chunks, chunk),
    )
    (re, im, lre, lim), accs = _chunk_loop(chunk_body, (re, im, lre, lim), chunks, n_chunks)
    psi0 = (re + 1j * im).astype(psi_final.dtype).reshape(psi_final.shape)
    lam0 = (lre + 1j * lim).astype(lam.dtype).reshape(lam.shape)
    return psi0, lam0, accs.reshape(-1)[:T]


def _screen_chain_kernel(
    xs_ref, zs_ref, cre_ref, cim_ref, re_ref, im_ref, wre_ref, wim_ref,
    acc_ref,
):
    """Pool-screening contributions 2 Im[c_t <w| s_z P_t |psi>], both
    states VMEM-resident; per-term scalars land in one-hot slots."""
    rows = re_ref.shape[0]
    T = xs_ref.shape[0]
    re = re_ref[:]
    im = im_ref[:]
    wre = wre_ref[:]
    wim = wim_ref[:]
    slot_row = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
    slot_lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 1)
    slot_id = (slot_row << np.int32(LANE_BITS)) | slot_lane

    def body(i, acc):
        tre = _xor_permute(re, xs_ref[i], rows)
        tim = _xor_permute(im, xs_ref[i], rows)
        s = _parity_sign(zs_ref[i], rows)
        vr = jnp.sum(s * (wre * tre + wim * tim))
        vi = jnp.sum(s * (wre * tim - wim * tre))
        contrib = 2.0 * (cre_ref[i] * vi + cim_ref[i] * vr)
        return acc + contrib * jnp.where(
            slot_id == i, jnp.float32(1.0), jnp.float32(0.0)
        )

    acc_ref[:] = jax.lax.fori_loop(0, T, body, jnp.zeros((8, LANE), jnp.float32))


@functools.partial(jax.jit, static_argnames=("n",))
def screen_chain_pallas(psi, w, n: int, xs, zs, cre, cim):
    """Per-term screening contributions (caller segment-sums by generator
    index).  Zero-coefficient padding contributes exactly 0."""
    if n < 10:
        raise ValueError("screen_chain_pallas needs at least 10 qubits")
    if xs.shape[0] == 0:
        return jnp.zeros((0,), jnp.float32)
    rows = (1 << n) // LANE
    re = jnp.real(psi).astype(jnp.float32).reshape(rows, LANE)
    im = jnp.imag(psi).astype(jnp.float32).reshape(rows, LANE)
    wre = jnp.real(w).astype(jnp.float32).reshape(rows, LANE)
    wim = jnp.imag(w).astype(jnp.float32).reshape(rows, LANE)

    T = xs.shape[0]
    chunk = ADJOINT_CHUNK if T > ADJOINT_CHUNK else max(T, 1)
    pad = (-T) % chunk
    xs = jnp.pad(jnp.asarray(xs, jnp.uint32), (0, pad))
    zs = jnp.pad(jnp.asarray(zs, jnp.uint32), (0, pad))
    cre = jnp.pad(jnp.asarray(cre, jnp.float32), (0, pad))
    cim = jnp.pad(jnp.asarray(cim, jnp.float32), (0, pad))
    n_chunks = (T + pad) // chunk

    call = pl.pallas_call(
        _screen_chain_kernel,
        out_shape=jax.ShapeDtypeStruct((8, LANE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.devices()[0].platform == "cpu",
    )

    def chunk_body(_, term):
        cxs, czs, ccr, cci = term
        acc = call(cxs, czs, ccr, cci, re, im, wre, wim)
        return None, acc.reshape(-1)[:chunk]

    chunks = (
        xs.reshape(n_chunks, chunk),
        zs.reshape(n_chunks, chunk),
        cre.reshape(n_chunks, chunk),
        cim.reshape(n_chunks, chunk),
    )
    _, accs = _chunk_loop(chunk_body, None, chunks, n_chunks)
    return accs.reshape(-1)[:T]


# -- HBM-streaming kernels (n beyond the VMEM-resident cap) ---------------------
#
# Above chain_max_qubits() the statevector no longer fits VMEM, so the
# chain kernels cannot hold it resident.  Expectations and operator
# applications are SUMS over Pauli terms -- freely reorderable -- which
# admits a streaming design: group the terms by the HIGH bits of their
# flip mask (the bits that cross stream blocks), and for each group run
# ONE gridded pallas call over (rows/BLOCK) blocks where output block i
# reads input block i ^ group_flip via a static XOR index map.  Inside a
# block, all of the group's terms apply while the (block, partner-block)
# pair is VMEM-resident: HBM traffic is (groups + 1) state reads instead
# of per-term passes, and the program stays O(groups) pallas calls
# (Hubbard Hamiltonians have few distinct cross-block flip patterns --
# hopping terms are local under Jordan-Wigner).
#
# The masks must be HOST constants (they are: Observable._scan_terms
# builds numpy arrays) -- the grouping and index maps are static, so no
# scalar-prefetch machinery is needed.  Rotations are NOT reorderable and
# keep the XLA scan path above the chain cap.


def stream_max_qubits() -> int:
    """Largest n the HBM-streaming expectation/apply kernels accept.

    Bounded by uint32 flat masks (n <= 32) and compile/HBM practicality on
    one chip; ``QSFH_PALLAS_STREAM_MAX_N`` overrides."""
    return int(os.environ.get("QSFH_PALLAS_STREAM_MAX_N", "24"))


def _stream_block_rows(rows: int) -> int:
    """Rows per stream block, halved for small states so there are always
    >= 2 blocks.

    The dynamic kernels run 2048-row blocks (1 MB/plane, ~5 MB working
    set).  The static kernels hold more planes live (conj + partner +
    per-subgroup permuted pairs + weight accumulators): measured scoped
    VMEM was 28.4 MB at 2048 rows and 16.0 MB at 512 (the separable-
    weight columns then pushed it 416 KB over the 16 MB v5e limit,
    2026-08-19); 256-row blocks halve every live plane to ~8 MB with
    real headroom, at unchanged total HBM bytes.

    At 30 qubits (rows >= 2^23) even the 256-row fused-static working
    set reproducibly crashed the tunneled worker (kernel fault,
    tpu_stream_30.log); 128-row blocks run clean -- 565.6 ms vs 1018 ms
    grouped (tpu_stream_big_30.json, round 5) -- so the static cap
    halves again there."""
    env = os.environ.get("QSFH_PALLAS_STREAM_ROWS")
    if _stream_static_enabled():
        cap = 256 if rows < (1 << 23) else 128
    else:
        cap = 2048
    br = int(env) if env else min(cap, rows // 2)
    if br < 8 or rows % br:
        raise ValueError(f"invalid stream block rows {br} for {rows} rows")
    return br


def _order_runs(xs: np.ndarray, bb: int):
    """Order-PRESERVING run partition for rotation-like (non-reorderable)
    term sequences: consecutive block-local terms (flip bits above
    LANE_BITS+bb all zero) merge into one chained run; every
    block-crossing term is its own single-term run.  Returns
    [(xh, [term indices])]."""
    xh_all = (np.asarray(xs, np.uint64) >> np.uint64(LANE_BITS + bb)).astype(np.int64)
    runs: list = []
    for t in range(xs.shape[0]):
        h = int(xh_all[t])
        if h == 0 and runs and runs[-1][0] == 0:
            runs[-1][1].append(t)
        else:
            runs.append((h, [t]))
    return runs


def _run_chunk_masks(xs: np.ndarray, zs: np.ndarray, part: np.ndarray, bb: int):
    """(xlo, zlo, zhi) device arrays for one chunk of term indices (the
    in-block flip/phase masks and the block-bit z mask)."""
    inb = np.uint32((1 << (LANE_BITS + bb)) - 1)
    xlo = jnp.asarray(xs[part] & inb)
    zlo = jnp.asarray(zs[part] & inb)
    zhi = jnp.asarray((zs[part] >> np.uint32(LANE_BITS + bb)).astype(np.int32))
    return xlo, zlo, zhi


def _stream_groups(xs: np.ndarray, bb: int):
    """Group term indices by the block-crossing flip bits xs >> (7 + bb)."""
    xh = (np.asarray(xs, np.uint64) >> np.uint64(LANE_BITS + bb)).astype(np.int64)
    groups = {}
    for t, h in enumerate(xh):
        groups.setdefault(int(h), []).append(t)
    return groups


def _expectation_stream_kernel(
    nhi, xlo_ref, zlo_ref, zhi_ref, cre_ref, cim_ref,
    sre_ref, sim_ref, pre_ref, pim_ref, out_ref,
):
    """One group's contribution to Re<psi|sum c_t s_z P_t|psi>, streamed.

    Block i of the conjugate side pairs with partner block i ^ group_flip
    (delivered by the static index map); in-block flip bits apply via
    _xor_permute.  The z mask's block bits contribute a per-(term, block)
    scalar parity that flips the whole tile sign: parity(zhi & i), with
    nhi static high bits.  Grid steps accumulate into one (8, LANE) tile.
    """
    i = pl.program_id(0)
    br = sre_ref.shape[0]
    re = sre_ref[:]
    im = sim_ref[:]
    tre0 = pre_ref[:]
    tim0 = pim_ref[:]
    T = xlo_ref.shape[0]

    def body(j, acc):
        tre = _xor_permute(tre0, xlo_ref[j], br)
        tim = _xor_permute(tim0, xlo_ref[j], br)
        s = _parity_sign(zlo_ref[j], br)
        s = _block_parity_flip(s, zhi_ref[j], i, nhi)
        vr = jnp.sum(s * (re * tre + im * tim))
        vi = jnp.sum(s * (re * tim - im * tre))
        return acc + cre_ref[j] * vr - cim_ref[j] * vi

    acc = jax.lax.fori_loop(0, T, body, jnp.float32(0.0))

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros((8, LANE), jnp.float32) + acc

    @pl.when(i > 0)
    def _accum():
        out_ref[:] = out_ref[:] + acc


def _apply_stream_kernel(
    nhi, xlo_ref, zlo_ref, zhi_ref, cre_ref, cim_ref,
    pre_ref, pim_ref, ore_ref, oim_ref,
):
    """One group of (sum c_t s_z P_t)|psi>, streamed: output block i is
    built entirely from partner block i ^ group_flip."""
    i = pl.program_id(0)
    br = pre_ref.shape[0]
    tre0 = pre_ref[:]
    tim0 = pim_ref[:]
    T = xlo_ref.shape[0]

    def body(j, carry):
        ar, ai = carry
        tre = _xor_permute(tre0, xlo_ref[j], br)
        tim = _xor_permute(tim0, xlo_ref[j], br)
        s = _parity_sign(zlo_ref[j], br)
        s = _block_parity_flip(s, zhi_ref[j], i, nhi)
        cr = cre_ref[j]
        ci = cim_ref[j]
        ar = ar + s * (cr * tre - ci * tim)
        ai = ai + s * (cr * tim + ci * tre)
        return (ar, ai)

    zero = jnp.zeros((br, LANE), jnp.float32)
    ar, ai = jax.lax.fori_loop(0, T, body, (zero, zero))
    ore_ref[:] = ar
    oim_ref[:] = ai


def _stream_setup_planes(re, im, n: int, xs):
    """Static stream geometry for f32 (rows, LANE) re/im planes."""
    rows = (1 << n) // LANE
    br = _stream_block_rows(rows)
    bb = br.bit_length() - 1
    nb = rows // br
    nhi = max(n - LANE_BITS - bb, 0)
    if re.shape != (rows, LANE) or im.shape != (rows, LANE):
        raise ValueError(f"planes must be ({rows}, {LANE}) for n={n}")
    groups = _stream_groups(xs, bb)
    return rows, br, bb, nb, nhi, re, im, groups


def _stream_setup(psi, n: int, xs):
    rows = (1 << n) // LANE
    re = jnp.real(psi).astype(jnp.float32).reshape(rows, LANE)
    im = jnp.imag(psi).astype(jnp.float32).reshape(rows, LANE)
    return _stream_setup_planes(re, im, n, xs)


def _group_arrays(idx, xs, zs, cre, cim, bb):
    inb = np.uint32((1 << (LANE_BITS + bb)) - 1)
    xlo = jnp.asarray(np.asarray(xs, np.uint32)[idx] & inb)
    zlo = jnp.asarray(np.asarray(zs, np.uint32)[idx] & inb)
    zhi = jnp.asarray(
        (np.asarray(zs, np.uint32)[idx] >> np.uint32(LANE_BITS + bb)).astype(
            np.int32
        )
    )
    gcre = jnp.asarray(np.asarray(cre, np.float32)[idx])
    gcim = jnp.asarray(np.asarray(cim, np.float32)[idx])
    return xlo, zlo, zhi, gcre, gcim


def _stream_static_enabled() -> bool:
    """Static-mask streaming kernels (default ON; QSFH_STREAM_STATIC=0
    falls back to the dynamic fori_loop kernels)."""
    return os.environ.get("QSFH_STREAM_STATIC", "1") == "1"


def _stream_static_max_terms() -> int:
    """Per-group unroll bound for the static kernels; groups larger than
    this fall back to the dynamic data-driven loop (compile-size guard
    for molecular-scale Hamiltonians)."""
    return int(os.environ.get("QSFH_STREAM_STATIC_MAX_TERMS", "128"))


def _static_terms(idx, xs, zs, cre, cim, bb):
    """HOST-side (xlo, zlo, zhi, cre, cim) tuples for one flip group."""
    xs = np.asarray(xs, np.uint32)
    zs = np.asarray(zs, np.uint32)
    cre = np.asarray(cre, np.float32)
    cim = np.asarray(cim, np.float32)
    inb = (1 << (LANE_BITS + bb)) - 1
    return [
        (int(xs[t]) & inb, int(zs[t]) & inb,
         int(zs[t]) >> (LANE_BITS + bb), float(cre[t]), float(cim[t]))
        for t in idx
    ]


def _static_subgroups(terms):
    """Sort one group's terms by DISTINCT in-block flip mask.

    Returns ``(order, plan)``: ``order`` permutes the caller's term
    positions into subgroup-sorted order, ``plan`` is a static list of
    (xlo, [(zlo, zhi, cre, cim), ...]) with HOST values.  One permute per
    distinct xlo services every term sharing it (XX/YY hopping pairs share
    x masks, so this typically halves the permute count)."""
    subs = {}
    for j, (xlo, _zlo, _zhi, _cr, _ci) in enumerate(terms):
        subs.setdefault(xlo, []).append(j)
    order = []
    plan = []
    for xlo in sorted(subs):
        plan.append((xlo, [terms[j][1:] for j in subs[xlo]]))
        order.extend(subs[xlo])
    return order, plan


def _slane_static(zlane: int):
    """(1, LANE) lane-sign row (-1)^parity(l & zlane), zlane HOST-static.

    Built from iota INSIDE the kernel (pallas rejects captured array
    constants); only the SET bits of zlane cost ops, on LANE elements.
    None for zlane == 0 so callers skip the multiply."""
    zlane = int(zlane)
    if zlane == 0:
        return None
    lane = jax.lax.broadcasted_iota(jnp.uint32, (1, LANE), 1)
    par = jnp.zeros((1, LANE), jnp.uint32)
    t = 0
    while zlane:
        if zlane & 1:
            par = par ^ ((lane >> np.uint32(t)) & np.uint32(1))
        zlane >>= 1
        t += 1
    return jnp.where(par > np.uint32(0), jnp.float32(-1.0), jnp.float32(1.0))


def _srow_static(zrow: int, br: int):
    """(br, 1) in-block row-sign column (-1)^parity(r & zrow), zrow static.

    Only the SET bits of zrow cost ops, and they run on (br, 1) elements
    -- 128x fewer than a full-plane parity."""
    zrow = int(zrow)
    if zrow == 0:
        return None
    r = jax.lax.broadcasted_iota(jnp.uint32, (br, 1), 0)
    par = jnp.zeros((br, 1), jnp.uint32)
    t = 0
    while zrow:
        if zrow & 1:
            par = par ^ ((r >> np.uint32(t)) & np.uint32(1))
        zrow >>= 1
        t += 1
    return jnp.where(par > np.uint32(0), jnp.float32(-1.0), jnp.float32(1.0))


def _accum_col(col, srow, bs, c: float):
    """col += c * bs * srow on a (br, 1) column (srow None => all-ones)."""
    if c == 0.0:
        return col
    coeff = jnp.float32(c) if bs is None else jnp.float32(c) * bs
    return col + (coeff if srow is None else coeff * srow)


def _lane_subgroups(subterms):
    """Regroup one xlo subgroup's static terms by DISTINCT z lane mask.

    Entries are (zlo, zhi, *payload); returns
    [(zlane, [(zrow, zhi, *payload), ...])] sorted by zlane."""
    by_lane = {}
    for (zlo, zhi, *payload) in subterms:
        by_lane.setdefault(zlo & (LANE - 1), []).append(
            (zlo >> LANE_BITS, zhi, *payload)
        )
    return sorted(by_lane.items())


def _weight_planes_static(subterms, i, br, want_im: bool):
    """(W_re, W_im) = sum_j c_j s_j(b) over one xlo subgroup, HOST-static.

    The z masks are host numpy, and a Pauli sign plane is SEPARABLE:
    s(b) = srow(row bits) * slane(lane bits) * blocksign(block bits).
    Terms regroup by distinct z lane mask: each term accumulates into a
    (br, 1) sign-weighted COLUMN (cheap VPU ops on br elements), and only
    each distinct zlane costs one full-plane broadcast FMA -- versus the
    earlier fori_loop's traced-mask bit-loop sign plane at ~50 full-plane
    ops per TERM, the measured reason the round-3 static kernels sat
    6.6-9.2x over their HBM roofline (benchmarks/tpu_utilization.json
    measured_over_roofline_x).  Live temporaries are (br, 1) columns plus
    the two accumulator planes, so neither the 192 MB register-spill of
    the fully-static form (full sign plane per term held live) nor the
    16.4 MB scoped-VMEM overflow of the rank-1-per-term form (measured
    at 24q, 2026-08-19) can recur."""
    wr = jnp.zeros((br, LANE), jnp.float32)
    wi = jnp.zeros((br, LANE), jnp.float32) if want_im else None
    for zlane, terms in _lane_subgroups(subterms):
        slane = _slane_static(zlane)
        colr = jnp.zeros((br, 1), jnp.float32)
        coli = jnp.zeros((br, 1), jnp.float32) if want_im else None
        for (zrow, zhi, cr, ci) in terms:
            srow = _srow_static(zrow, br)
            bs = _block_sign_static(zhi, i)
            colr = _accum_col(colr, srow, bs, cr)
            if want_im:
                coli = _accum_col(coli, srow, bs, ci)
        wr = wr + (colr if slane is None else colr * slane)
        if want_im:
            wi = wi + (coli if slane is None else coli * slane)
    return wr, wi


def _make_expectation_stream_kernel_static(nhi, plan, want_im: bool):
    """One-group expectation kernel: static permutes, separable weights."""

    def kernel(sre_ref, sim_ref, pre_ref, pim_ref, out_ref):
        i = pl.program_id(0)
        br = sre_ref.shape[0]
        re = sre_ref[:]
        im = sim_ref[:]
        tre0 = pre_ref[:]
        tim0 = pim_ref[:]
        acc = jnp.float32(0.0)
        for xlo, subterms in plan:
            tre = _xor_permute_static(tre0, xlo, br)
            tim = _xor_permute_static(tim0, xlo, br)
            wr, wi = _weight_planes_static(subterms, i, br, want_im)
            acc = acc + jnp.sum(wr * (re * tre + im * tim))
            if want_im:
                acc = acc - jnp.sum(wi * (re * tim - im * tre))

        @pl.when(i == 0)
        def _init():
            out_ref[:] = jnp.zeros((8, LANE), jnp.float32) + acc

        @pl.when(i > 0)
        def _accum():
            out_ref[:] = out_ref[:] + acc

    return kernel


def _make_apply_stream_kernel_static(nhi, plan, want_im: bool):
    """One-group apply kernel: static permutes, separable weights."""

    def kernel(pre_ref, pim_ref, ore_ref, oim_ref):
        i = pl.program_id(0)
        br = pre_ref.shape[0]
        tre0 = pre_ref[:]
        tim0 = pim_ref[:]
        ar = jnp.zeros((br, LANE), jnp.float32)
        ai = jnp.zeros((br, LANE), jnp.float32)
        for xlo, subterms in plan:
            tre = _xor_permute_static(tre0, xlo, br)
            tim = _xor_permute_static(tim0, xlo, br)
            wr, wi = _weight_planes_static(subterms, i, br, want_im)
            ar = ar + wr * tre
            ai = ai + wr * tim
            if want_im:
                ar = ar - wi * tim
                ai = ai + wi * tre
        ore_ref[:] = ar
        oim_ref[:] = ai

    return kernel


def _make_screen_stream_kernel_static(nhi, plan):
    """One-group screening kernel: static permutes, per-term scalars via
    separable reductions (slots follow the subgroup-sorted order; the
    caller extends ``perm`` accordingly).

    Per term the lane signs fold into a lane-weighted row reduction and
    the row signs into the final (br, 1) dot -- 2 full-plane ops per
    term per product plane instead of a traced-mask sign plane."""

    def kernel(wre_ref, wim_ref, pre_ref, pim_ref, acc_ref):
        i = pl.program_id(0)
        br = wre_ref.shape[0]
        wre = wre_ref[:]
        wim = wim_ref[:]
        tre0 = pre_ref[:]
        tim0 = pim_ref[:]
        slot_row = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
        slot_lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 1)
        slot_id = (slot_row << np.int32(LANE_BITS)) | slot_lane
        acc = jnp.zeros((8, LANE), jnp.float32)
        t = 0
        for xlo, subterms in plan:
            tre = _xor_permute_static(tre0, xlo, br)
            tim = _xor_permute_static(tim0, xlo, br)
            a_pl = wre * tre + wim * tim
            b_pl = wre * tim - wim * tre
            # slots were assigned in subterm order; regrouping by zlane
            # permutes them, so carry each term's slot through the regroup
            slotted = [(zlo, zhi, (cr, ci, t + j))
                       for j, (zlo, zhi, cr, ci) in enumerate(subterms)]
            t += len(subterms)
            for zlane, terms in _lane_subgroups(slotted):
                slane = _slane_static(zlane)
                # ONE pair of lane-weighted row reductions per distinct
                # zlane, shared by every term carrying it
                ra = jnp.sum(a_pl if slane is None else a_pl * slane,
                             axis=1, keepdims=True)
                rb = jnp.sum(b_pl if slane is None else b_pl * slane,
                             axis=1, keepdims=True)
                for (zrow, zhi, (cr, ci, slot)) in terms:
                    srow = _srow_static(zrow, br)
                    bs = _block_sign_static(zhi, i)
                    if srow is None:
                        vr = jnp.sum(ra)
                        vi = jnp.sum(rb)
                    else:
                        vr = jnp.sum(srow * ra)
                        vi = jnp.sum(srow * rb)
                    if bs is not None:
                        vr = bs * vr
                        vi = bs * vi
                    contrib = 2.0 * (jnp.float32(cr) * vi + jnp.float32(ci) * vr)
                    acc = acc + contrib * jnp.where(
                        slot_id == np.int32(slot),
                        jnp.float32(1.0), jnp.float32(0.0),
                    )

        @pl.when(i == 0)
        def _init():
            acc_ref[:] = acc

        @pl.when(i > 0)
        def _accum():
            acc_ref[:] = acc_ref[:] + acc

    return kernel


def _screen_stream_kernel(
    nhi, xlo_ref, zlo_ref, zhi_ref, cre_ref, cim_ref,
    wre_ref, wim_ref, pre_ref, pim_ref, acc_ref,
):
    """One group of screening contributions 2 Im[c_t <w| s_z P_t |psi>],
    streamed: w blocks pair with psi partner blocks; per-term scalars land
    in one-hot (8, LANE) slots accumulated across grid blocks."""
    i = pl.program_id(0)
    br = wre_ref.shape[0]
    wre = wre_ref[:]
    wim = wim_ref[:]
    tre0 = pre_ref[:]
    tim0 = pim_ref[:]
    T = xlo_ref.shape[0]
    slot_row = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
    slot_lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 1)
    slot_id = (slot_row << np.int32(LANE_BITS)) | slot_lane

    def body(j, acc):
        tre = _xor_permute(tre0, xlo_ref[j], br)
        tim = _xor_permute(tim0, xlo_ref[j], br)
        s = _parity_sign(zlo_ref[j], br)
        s = _block_parity_flip(s, zhi_ref[j], i, nhi)
        vr = jnp.sum(s * (wre * tre + wim * tim))
        vi = jnp.sum(s * (wre * tim - wim * tre))
        contrib = 2.0 * (cre_ref[j] * vi + cim_ref[j] * vr)
        return acc + contrib * jnp.where(
            slot_id == j, jnp.float32(1.0), jnp.float32(0.0)
        )

    acc = jax.lax.fori_loop(0, T, body, jnp.zeros((8, LANE), jnp.float32))

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = acc

    @pl.when(i > 0)
    def _accum():
        acc_ref[:] = acc_ref[:] + acc


def screen_stream_pallas(psi, w, n: int, xs, zs, cre, cim):
    """Per-term screening contributions for states larger than VMEM.

    Returns ``(contribs, perm)``: contribution values in group-permuted
    order plus the host permutation (numpy int array) mapping them back to
    input term positions -- the caller segment-sums by ``ks[perm]``.
    Groups larger than the 1024 one-hot slots are chunked.
    """
    if n < 11:
        raise ValueError("screen_stream_pallas needs at least 11 qubits")
    rows = (1 << n) // LANE
    re = jnp.real(psi).astype(jnp.float32).reshape(rows, LANE)
    im = jnp.imag(psi).astype(jnp.float32).reshape(rows, LANE)
    wre = jnp.real(w).astype(jnp.float32).reshape(rows, LANE)
    wim = jnp.imag(w).astype(jnp.float32).reshape(rows, LANE)
    return screen_stream_planes(wre, wim, re, im, n, xs, zs, cre, cim)


def screen_stream_perm(n: int, xs, zs, cre, cim):
    """HOST-only slot permutation of :func:`screen_stream_planes`.

    The streamed screen emits per-term slots in (flip-group, chunk,
    subgroup-sorted) order; this reproduces that order without touching
    the device (the perm is static metadata, but calling the planes
    function eagerly would dispatch one compile per group).  Kept in
    lockstep with screen_stream_planes by tests/test_pallas.py."""
    rows = (1 << n) // LANE
    br = _stream_block_rows(rows)
    bb = br.bit_length() - 1
    groups = _stream_groups(xs, bb)
    static_ok = _stream_static_enabled()
    cap = _stream_static_max_terms()
    # static mode iterates cap-size chunks so EVERY chunk stays on the
    # static kernel (lockstep with screen_stream_planes below)
    step = min(cap, 8 * LANE) if static_ok else 8 * LANE
    perm = []
    for _xh, idx in sorted(groups.items()):
        for lo in range(0, len(idx), step):
            chunk = idx[lo : lo + step]
            if static_ok and len(chunk) <= cap:
                terms = _static_terms(chunk, xs, zs, cre, cim, bb)
                order, _plan = _static_subgroups(terms)
                perm.extend(chunk[p] for p in order)
            else:
                perm.extend(chunk)
    return np.asarray(perm, np.int64)


def screen_stream_planes(wre, wim, re, im, n: int, xs, zs, cre, cim):
    """Per-term screening contributions on f32 planes directly (w first,
    matching <w| ... |psi>; same return contract as screen_stream_pallas)."""
    if n < 11:
        raise ValueError("screen_stream_planes needs at least 11 qubits")
    rows, br, bb, nb, nhi, re, im, groups = _stream_setup_planes(re, im, n, xs)
    if wre.shape != (rows, LANE) or wim.shape != (rows, LANE):
        raise ValueError(f"w planes must be ({rows}, {LANE}) for n={n}")

    vals = []
    perm = []
    static_ok = _stream_static_enabled()
    cap = _stream_static_max_terms()
    # cap-size chunks in static mode (lockstep with screen_stream_perm)
    step = min(cap, 8 * LANE) if static_ok else 8 * LANE
    for xh, idx in sorted(groups.items()):
        for lo in range(0, len(idx), step):
            chunk = idx[lo : lo + step]
            if static_ok and len(chunk) <= cap:
                terms = _static_terms(chunk, xs, zs, cre, cim, bb)
                order, plan = _static_subgroups(terms)
                kernel = _make_screen_stream_kernel_static(nhi, plan)
                acc = pl.pallas_call(
                    kernel,
                    grid=(nb,),
                    out_shape=jax.ShapeDtypeStruct((8, LANE), jnp.float32),
                    in_specs=[
                        pl.BlockSpec((br, LANE), lambda i: (i, 0)),
                        pl.BlockSpec((br, LANE), lambda i: (i, 0)),
                        pl.BlockSpec((br, LANE), lambda i, _h=xh: (i ^ _h, 0)),
                        pl.BlockSpec((br, LANE), lambda i, _h=xh: (i ^ _h, 0)),
                    ],
                    out_specs=pl.BlockSpec((8, LANE), lambda i: (0, 0)),
                    interpret=jax.devices()[0].platform == "cpu",
                )(wre, wim, re, im)
                # slots follow the subgroup-sorted order
                vals.append(acc.reshape(-1)[: len(chunk)])
                perm.extend(chunk[p] for p in order)
                continue
            xlo, zlo, zhi, gcre, gcim = _group_arrays(chunk, xs, zs, cre, cim, bb)
            acc = pl.pallas_call(
                functools.partial(_screen_stream_kernel, nhi),
                grid=(nb,),
                out_shape=jax.ShapeDtypeStruct((8, LANE), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 5
                + [
                    pl.BlockSpec((br, LANE), lambda i: (i, 0)),
                    pl.BlockSpec((br, LANE), lambda i: (i, 0)),
                    pl.BlockSpec((br, LANE), lambda i, _h=xh: (i ^ _h, 0)),
                    pl.BlockSpec((br, LANE), lambda i, _h=xh: (i ^ _h, 0)),
                ],
                out_specs=pl.BlockSpec((8, LANE), lambda i: (0, 0)),
                interpret=jax.devices()[0].platform == "cpu",
            )(xlo, zlo, zhi, gcre, gcim, wre, wim, re, im)
            vals.append(acc.reshape(-1)[: len(chunk)])
            perm.extend(chunk)
    return jnp.concatenate(vals), np.asarray(perm, np.int64)


def expectation_stream_pallas(psi, n: int, xs, zs, cre, cim):
    """Re <psi| sum_t c_t s_z P_t |psi> for states larger than VMEM.

    ``xs``/``zs`` must be host numpy arrays (static grouping).  One gridded
    pallas call per distinct block-crossing flip pattern; XLA sums the
    per-group scalars.
    """
    if n < 11:
        raise ValueError("expectation_stream_pallas needs at least 11 qubits")
    rows = (1 << n) // LANE
    re = jnp.real(psi).astype(jnp.float32).reshape(rows, LANE)
    im = jnp.imag(psi).astype(jnp.float32).reshape(rows, LANE)
    return expectation_stream_planes(re, im, n, xs, zs, cre, cim)


def expectation_stream_planes(re, im, n: int, xs, zs, cre, cim,
                              partner_re=None, partner_im=None):
    """Streaming expectation on f32 (rows, LANE) planes directly.

    The planes entry point exists for statevectors too large to ever
    materialize as a complex array (26-30 qubits on one chip: the complex
    copy alone would double HBM use); callers such as the product-state
    validation harness (engine/product_state.py) build the planes on
    device and never hold |psi> in complex form.

    ``partner_re``/``partner_im`` override the flip-side planes: the
    amplitude-sharded evaluator (parallel/sharded_stream.py) feeds the
    ppermute-exchanged remote shard here while the conjugate side stays
    local, so one kernel family serves both the single-chip and the
    cross-shard paths.  Default: the local planes themselves.
    """
    if n < 11:
        raise ValueError("expectation_stream_planes needs at least 11 qubits")
    rows, br, bb, nb, nhi, re, im, groups = _stream_setup_planes(re, im, n, xs)
    pre = re if partner_re is None else partner_re
    pim = im if partner_im is None else partner_im

    total = jnp.float32(0.0)
    static_ok = _stream_static_enabled()
    cap = _stream_static_max_terms()
    for xh, idx in sorted(groups.items()):
        if static_ok:
            # over-cap groups SPLIT into cap-size chunks, each served by
            # the static kernel: the extra plane re-reads beat the dynamic
            # kernel's MXU-bound term loop by ~20x (the bimodal chunk
            # costs of benchmarks/tpu_screen_24.log were exactly the
            # groups that tripped this cap into the dynamic fallback)
            for lo in range(0, len(idx), cap):
                chunk = idx[lo : lo + cap]
                terms = _static_terms(chunk, xs, zs, cre, cim, bb)
                order, plan = _static_subgroups(terms)
                want_im = any(t[4] != 0.0 for t in terms)
                kernel = _make_expectation_stream_kernel_static(
                    nhi, plan, want_im
                )
                out = pl.pallas_call(
                    kernel,
                    grid=(nb,),
                    out_shape=jax.ShapeDtypeStruct((8, LANE), jnp.float32),
                    in_specs=[
                        pl.BlockSpec((br, LANE), lambda i: (i, 0)),
                        pl.BlockSpec((br, LANE), lambda i: (i, 0)),
                        pl.BlockSpec((br, LANE), lambda i, _h=xh: (i ^ _h, 0)),
                        pl.BlockSpec((br, LANE), lambda i, _h=xh: (i ^ _h, 0)),
                    ],
                    out_specs=pl.BlockSpec((8, LANE), lambda i: (0, 0)),
                    interpret=jax.devices()[0].platform == "cpu",
                )(re, im, pre, pim)
                total = total + out[0, 0]
            continue
        xlo, zlo, zhi, gcre, gcim = _group_arrays(idx, xs, zs, cre, cim, bb)
        out = pl.pallas_call(
            functools.partial(_expectation_stream_kernel, nhi),
            grid=(nb,),
            out_shape=jax.ShapeDtypeStruct((8, LANE), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 5
            + [
                pl.BlockSpec((br, LANE), lambda i: (i, 0)),
                pl.BlockSpec((br, LANE), lambda i: (i, 0)),
                pl.BlockSpec((br, LANE), lambda i, _h=xh: (i ^ _h, 0)),
                pl.BlockSpec((br, LANE), lambda i, _h=xh: (i ^ _h, 0)),
            ],
            out_specs=pl.BlockSpec((8, LANE), lambda i: (0, 0)),
            interpret=jax.devices()[0].platform == "cpu",
        )(xlo, zlo, zhi, gcre, gcim, re, im, pre, pim)
        total = total + out[0, 0]
    return total


def _expectation_stream_fused_kernel(
    nhi,
    xh_ref, start_ref, cnt_ref, xlo_ref, zlo_ref, zhi_ref, cre_ref, cim_ref,
    sre_ref, sim_ref, pre_ref, pim_ref, out_ref,
):
    """ALL groups in one gridded kernel (grid = (block, group)).

    The group axis is innermost, so the conjugate-side block (index map
    independent of g) stays VMEM-resident across every group: HBM traffic
    is (1 + G) state reads per eval instead of the per-group form's 2G.
    Term metadata arrives via scalar prefetch; each group's terms are a
    dynamic [start, start+count) slice of the flat SMEM arrays.
    """
    i = pl.program_id(0)
    g = pl.program_id(1)
    br = sre_ref.shape[0]
    re = sre_ref[:]
    im = sim_ref[:]
    tre0 = pre_ref[:]
    tim0 = pim_ref[:]
    s0 = start_ref[g]

    def body(j, acc):
        t = s0 + j
        tre = _xor_permute(tre0, xlo_ref[t], br)
        tim = _xor_permute(tim0, xlo_ref[t], br)
        s = _parity_sign(zlo_ref[t], br)
        s = _block_parity_flip(s, zhi_ref[t], i, nhi)
        vr = jnp.sum(s * (re * tre + im * tim))
        vi = jnp.sum(s * (re * tim - im * tre))
        return acc + cre_ref[t] * vr - cim_ref[t] * vi

    acc = jax.lax.fori_loop(0, cnt_ref[g], body, jnp.float32(0.0))
    first = jnp.logical_and(i == 0, g == 0)

    @pl.when(first)
    def _init():
        out_ref[:] = jnp.zeros((8, LANE), jnp.float32) + acc

    @pl.when(jnp.logical_not(first))
    def _accum():
        out_ref[:] = out_ref[:] + acc


def expectation_stream_fused(re, im, n: int, xs, zs, cre, cim):
    """Re <psi|sum c_t s_z P_t|psi> on planes, ONE pallas call for all
    flip groups (scalar-prefetch partner indexing).

    Same contract as expectation_stream_planes; ~2x less HBM traffic for
    many-group operators because the conjugate side streams through VMEM
    once total instead of once per group.  Validated against the grouped
    form + product-state closed forms in tests; opt-in for production
    paths until timed on-chip (QSFH_STREAM_FUSED=1).
    """
    if n < 11:
        raise ValueError("expectation_stream_fused needs at least 11 qubits")
    rows, br, bb, nb, nhi, re, im, groups = _stream_setup_planes(re, im, n, xs)
    (xh_arr, start, cnt, xlo, zlo, zhi, gcre, gcim, G) = _fused_stream_inputs(
        xs, zs, cre, cim, groups, bb
    )
    conj = pl.BlockSpec((br, LANE), lambda i, g, *refs: (i, 0))
    partner = pl.BlockSpec((br, LANE), lambda i, g, *refs: (i ^ refs[0][g], 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(nb, G),
        in_specs=[conj, conj, partner, partner],
        out_specs=pl.BlockSpec((8, LANE), lambda i, g, *refs: (0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_expectation_stream_fused_kernel, nhi),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, LANE), jnp.float32),
        interpret=jax.devices()[0].platform == "cpu",
    )(xh_arr, start, cnt, xlo, zlo, zhi, gcre, gcim, re, im, re, im)
    return out[0, 0]


def _make_expectation_stream_kernel_fused_static(group_plans):
    """ALL flip groups in one (nb,)-grid kernel with STATIC per-group
    plans: the conjugate side is read once per block (serving the xh==0
    group's partners too), every nonzero group's partner block arrives via
    a static XOR index map, and the per-term work is the separable-weight
    static body (~10x fewer permute flops than the dynamic fori_loop form,
    see _weight_planes_static).

    ``group_plans``: [(has_partner_refs, want_im, plan)] in input order;
    entries with has_partner_refs=False read the conjugate refs (xh == 0).
    """

    def kernel(*refs):
        out_ref = refs[-1]
        sre_ref, sim_ref = refs[0], refs[1]
        i = pl.program_id(0)
        br = sre_ref.shape[0]
        re = sre_ref[:]
        im = sim_ref[:]
        acc = jnp.float32(0.0)
        p = 2
        for has_partner, want_im, plan in group_plans:
            if has_partner:
                tre0 = refs[p][:]
                tim0 = refs[p + 1][:]
                p += 2
            else:
                tre0, tim0 = re, im
            for xlo, subterms in plan:
                tre = _xor_permute_static(tre0, xlo, br)
                tim = _xor_permute_static(tim0, xlo, br)
                wr, wi = _weight_planes_static(subterms, i, br, want_im)
                acc = acc + jnp.sum(wr * (re * tre + im * tim))
                if want_im:
                    acc = acc - jnp.sum(wi * (re * tim - im * tre))

        @pl.when(i == 0)
        def _init():
            out_ref[:] = jnp.zeros((8, LANE), jnp.float32) + acc

        @pl.when(i > 0)
        def _accum():
            out_ref[:] = out_ref[:] + acc

    return kernel


def _fused_static_group_cap() -> int:
    """Groups fused per pallas call.  Each nonzero group adds two
    double-buffered (br, LANE) partner inputs (~0.5 MB at br=256); 16
    keeps the working set near half of v5e VMEM with headroom for the
    weight/permute temporaries, and puts the 26q Hubbard (14 groups) in
    ONE call -- the measured best point (12.59 vs 15.38 ms for two
    calls, tpu_fusedstatic_probe.json)."""
    return int(os.environ.get("QSFH_STREAM_FUSED_GROUPS", "16"))


def expectation_stream_fused_static(re, im, n: int, xs, zs, cre, cim):
    """Re <psi|sum c_t s_z P_t|psi>: fused traffic, static per-term work.

    Combines the two measured wins that tpu_utilization.json shows were
    never harvested together (VERDICT r3 next #4): the fused layout's
    (1 + G) state passes instead of 2G (conjugate side read once), and the
    static kernels' separable sign planes (the dynamic fused form measured
    MXU-bound at 770 ms/26q; the static per-group form measured 38 ms at
    2G passes).  Groups beyond the per-call cap chunk into successive
    calls (conjugate side re-read once per extra call).
    """
    if n < 11:
        raise ValueError("expectation_stream_fused_static needs >= 11 qubits")
    rows, br, bb, nb, nhi, re, im, groups = _stream_setup_planes(re, im, n, xs)
    cap_terms = _stream_static_max_terms()
    gcap = _fused_static_group_cap()

    total = jnp.float32(0.0)
    pending = []  # (xh, terms) with static plans, batched up to gcap

    def flush(batch):
        nonlocal total
        if not batch:
            return
        group_plans = []
        in_specs = [
            pl.BlockSpec((br, LANE), lambda i: (i, 0)),
            pl.BlockSpec((br, LANE), lambda i: (i, 0)),
        ]
        inputs = [re, im]
        for xh, terms in batch:
            _order, plan = _static_subgroups(terms)
            want_im = any(t[4] != 0.0 for t in terms)
            if xh == 0:
                group_plans.append((False, want_im, plan))
            else:
                group_plans.append((True, want_im, plan))
                in_specs += [
                    pl.BlockSpec((br, LANE), lambda i, _h=xh: (i ^ _h, 0)),
                    pl.BlockSpec((br, LANE), lambda i, _h=xh: (i ^ _h, 0)),
                ]
                inputs += [re, im]
        kernel = _make_expectation_stream_kernel_fused_static(group_plans)
        out = pl.pallas_call(
            kernel,
            grid=(nb,),
            out_shape=jax.ShapeDtypeStruct((8, LANE), jnp.float32),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((8, LANE), lambda i: (0, 0)),
            interpret=jax.devices()[0].platform == "cpu",
        )(*inputs)
        total = total + out[0, 0]

    for xh, idx in sorted(groups.items()):
        # over-cap groups split into cap-size chunks (each re-reads the
        # partner planes; still ~20x cheaper than the dynamic fallback)
        for lo in range(0, len(idx), cap_terms):
            chunk = idx[lo : lo + cap_terms]
            pending.append((xh, _static_terms(chunk, xs, zs, cre, cim, bb)))
            if len(pending) >= gcap:
                flush(pending)
                pending = []
    flush(pending)
    return total


def apply_stream_pallas(psi, n: int, xs, zs, cre, cim):
    """(sum_t c_t s_z P_t)|psi> for states larger than VMEM (same grouping
    as expectation_stream_pallas; XLA sums the per-group planes)."""
    if n < 11:
        raise ValueError("apply_stream_pallas needs at least 11 qubits")
    rows, br, bb, nb, nhi, re, im, groups = _stream_setup(psi, n, xs)

    ore = jnp.zeros((rows, LANE), jnp.float32)
    oim = jnp.zeros((rows, LANE), jnp.float32)
    static_ok = _stream_static_enabled()
    cap = _stream_static_max_terms()
    for xh, idx in sorted(groups.items()):
        if static_ok:
            # cap-size chunks keep over-cap groups on the static kernel
            # (same fix as expectation_stream_planes)
            for lo in range(0, len(idx), cap):
                chunk = idx[lo : lo + cap]
                terms = _static_terms(chunk, xs, zs, cre, cim, bb)
                order, plan = _static_subgroups(terms)
                want_im = any(t[4] != 0.0 for t in terms)
                kernel = _make_apply_stream_kernel_static(nhi, plan, want_im)
                gre, gim = pl.pallas_call(
                    kernel,
                    grid=(nb,),
                    out_shape=(
                        jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
                        jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
                    ),
                    in_specs=[
                        pl.BlockSpec((br, LANE), lambda i, _h=xh: (i ^ _h, 0)),
                        pl.BlockSpec((br, LANE), lambda i, _h=xh: (i ^ _h, 0)),
                    ],
                    out_specs=(
                        pl.BlockSpec((br, LANE), lambda i: (i, 0)),
                        pl.BlockSpec((br, LANE), lambda i: (i, 0)),
                    ),
                    interpret=jax.devices()[0].platform == "cpu",
                )(re, im)
                ore = ore + gre
                oim = oim + gim
            continue
        xlo, zlo, zhi, gcre, gcim = _group_arrays(idx, xs, zs, cre, cim, bb)
        gre, gim = pl.pallas_call(
            functools.partial(_apply_stream_kernel, nhi),
            grid=(nb,),
            out_shape=(
                jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
                jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 5
            + [
                pl.BlockSpec((br, LANE), lambda i, _h=xh: (i ^ _h, 0)),
                pl.BlockSpec((br, LANE), lambda i, _h=xh: (i ^ _h, 0)),
            ],
            out_specs=(
                pl.BlockSpec((br, LANE), lambda i: (i, 0)),
                pl.BlockSpec((br, LANE), lambda i: (i, 0)),
            ),
            interpret=jax.devices()[0].platform == "cpu",
        )(xlo, zlo, zhi, gcre, gcim, re, im)
        ore = ore + gre
        oim = oim + gim
    return (ore + 1j * oim).astype(psi.dtype).reshape(psi.shape)


def _apply_stream_fused_kernel(
    nhi,
    xh_ref, start_ref, cnt_ref, xlo_ref, zlo_ref, zhi_ref, cre_ref, cim_ref,
    pre_ref, pim_ref, ore_ref, oim_ref,
):
    """ALL groups of (sum c_t s_z P_t)|psi> in one gridded kernel.

    grid = (block, group) with the group axis innermost: the output block
    (index map independent of g) stays VMEM-resident and accumulates every
    group's contribution, so HBM sees G partner reads + ONE output write
    instead of the per-group form's G reads + G writes + an XLA tree-add.
    """
    i = pl.program_id(0)
    g = pl.program_id(1)
    br = pre_ref.shape[0]
    tre0 = pre_ref[:]
    tim0 = pim_ref[:]
    s0 = start_ref[g]

    def body(j, carry):
        ar, ai = carry
        t = s0 + j
        tre = _xor_permute(tre0, xlo_ref[t], br)
        tim = _xor_permute(tim0, xlo_ref[t], br)
        s = _parity_sign(zlo_ref[t], br)
        s = _block_parity_flip(s, zhi_ref[t], i, nhi)
        cr = cre_ref[t]
        ci = cim_ref[t]
        ar = ar + s * (cr * tre - ci * tim)
        ai = ai + s * (cr * tim + ci * tre)
        return (ar, ai)

    zero = jnp.zeros((br, LANE), jnp.float32)
    ar, ai = jax.lax.fori_loop(0, cnt_ref[g], body, (zero, zero))

    @pl.when(g == 0)
    def _init():
        ore_ref[:] = ar
        oim_ref[:] = ai

    @pl.when(g > 0)
    def _accum():
        ore_ref[:] = ore_ref[:] + ar
        oim_ref[:] = oim_ref[:] + ai


def _fused_stream_inputs(xs, zs, cre, cim, groups, bb):
    """Flat scalar-prefetch arrays for the fused (block, group) kernels."""
    xs = np.asarray(xs, np.uint32)
    zs = np.asarray(zs, np.uint32)
    inb = np.uint32((1 << (LANE_BITS + bb)) - 1)
    order = [t for _, idx in sorted(groups.items()) for t in idx]
    cnt = np.asarray([len(groups[h]) for h in sorted(groups)], np.int32)
    start = np.asarray(np.concatenate([[0], np.cumsum(cnt)[:-1]]), np.int32)
    return (
        jnp.asarray(np.asarray(sorted(groups), np.int32)),
        jnp.asarray(start),
        jnp.asarray(cnt),
        jnp.asarray(xs[order] & inb),
        jnp.asarray(zs[order] & inb),
        jnp.asarray((zs[order] >> np.uint32(LANE_BITS + bb)).astype(np.int32)),
        jnp.asarray(np.asarray(cre, np.float32)[order]),
        jnp.asarray(np.asarray(cim, np.float32)[order]),
        len(cnt),
    )


def apply_stream_fused(re, im, n: int, xs, zs, cre, cim):
    """(sum_t c_t s_z P_t)|psi> on f32 planes, ONE pallas call for all
    groups (scalar-prefetch partner indexing; planes in, planes out).

    Opt-in counterpart of apply_stream_pallas until timed on-chip."""
    if n < 11:
        raise ValueError("apply_stream_fused needs at least 11 qubits")
    rows, br, bb, nb, nhi, re, im, groups = _stream_setup_planes(re, im, n, xs)
    (xh_arr, start, cnt, xlo, zlo, zhi, gcre, gcim, G) = _fused_stream_inputs(
        xs, zs, cre, cim, groups, bb
    )
    partner = pl.BlockSpec((br, LANE), lambda i, g, *refs: (i ^ refs[0][g], 0))
    outspec = pl.BlockSpec((br, LANE), lambda i, g, *refs: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(nb, G),
        in_specs=[partner, partner],
        out_specs=(outspec, outspec),
    )
    return pl.pallas_call(
        functools.partial(_apply_stream_fused_kernel, nhi),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
        ),
        interpret=jax.devices()[0].platform == "cpu",
    )(xh_arr, start, cnt, xlo, zlo, zhi, gcre, gcim, re, im)


def _adjoint_stream_local_kernel(
    nhi, xlo_ref, zlo_ref, zhi_ref, cos_ref, sin_ref, scale_ref,
    phre_ref, phim_ref,
    re_ref, im_ref, lre_ref, lim_ref,
    ore_ref, oim_ref, olre_ref, olim_ref, acc_ref,
):
    """Reverse adjoint sweep over a run of BLOCK-LOCAL terms, streamed.

    Per term (reversed order, matching _adjoint_chain_kernel): the
    BLOCK-PARTIAL contribution scale * Im<lam| P psi> lands in the term's
    one-hot (8, LANE) slot, accumulated across grid blocks; then both
    carriers are inverse-rotated in VMEM.
    """
    i = pl.program_id(0)
    br = re_ref.shape[0]
    T = xlo_ref.shape[0]
    slot_row = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
    slot_lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 1)
    slot_id = (slot_row << np.int32(LANE_BITS)) | slot_lane

    def body(j, carry):
        re, im, lre, lim, acc = carry
        s = _parity_sign(zlo_ref[j], br)
        s = _block_parity_flip(s, zhi_ref[j], i, nhi)
        pr = phre_ref[j]
        pi = phim_ref[j]
        tre = _xor_permute(re, xlo_ref[j], br)
        tim = _xor_permute(im, xlo_ref[j], br)
        pre = s * (pr * tre - pi * tim)
        pim = s * (pr * tim + pi * tre)
        contrib = scale_ref[j] * jnp.sum(lre * pim - lim * pre)
        acc = acc + contrib * jnp.where(
            slot_id == j, jnp.float32(1.0), jnp.float32(0.0)
        )
        c = cos_ref[j]
        sn = sin_ref[j]
        re, im = c * re - sn * pim, c * im + sn * pre
        tlre = _xor_permute(lre, xlo_ref[j], br)
        tlim = _xor_permute(lim, xlo_ref[j], br)
        plre = s * (pr * tlre - pi * tlim)
        plim = s * (pr * tlim + pi * tlre)
        lre, lim = c * lre - sn * plim, c * lim + sn * plre
        return (re, im, lre, lim, acc)

    re, im, lre, lim, acc = jax.lax.fori_loop(
        0, T, body,
        (re_ref[:], im_ref[:], lre_ref[:], lim_ref[:],
         jnp.zeros((8, LANE), jnp.float32)),
    )
    ore_ref[:] = re
    oim_ref[:] = im
    olre_ref[:] = lre
    olim_ref[:] = lim

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = acc

    @pl.when(i > 0)
    def _accum():
        acc_ref[:] = acc_ref[:] + acc


def _adjoint_stream_cross_kernel(
    nhi, xlo_ref, zlo_ref, zhi_ref, cos_ref, sin_ref, scale_ref,
    phre_ref, phim_ref,
    re_ref, im_ref, lre_ref, lim_ref,
    pre_ref, pim_ref, plre_ref, plim_ref,
    ore_ref, oim_ref, olre_ref, olim_ref, acc_ref,
):
    """One BLOCK-CROSSING adjoint term: P psi / P lam come from the
    XOR-paired partner blocks; the block-partial contribution accumulates
    across the grid like the local kernel."""
    i = pl.program_id(0)
    br = re_ref.shape[0]
    s = _parity_sign(zlo_ref[0], br)
    s = _block_parity_flip(s, zhi_ref[0], i, nhi)
    pr = phre_ref[0]
    pi = phim_ref[0]
    tre = _xor_permute(pre_ref[:], xlo_ref[0], br)
    tim = _xor_permute(pim_ref[:], xlo_ref[0], br)
    ppre = s * (pr * tre - pi * tim)
    ppim = s * (pr * tim + pi * tre)
    contrib = scale_ref[0] * jnp.sum(lre_ref[:] * ppim - lim_ref[:] * ppre)
    c = cos_ref[0]
    sn = sin_ref[0]
    ore_ref[:] = c * re_ref[:] - sn * ppim
    oim_ref[:] = c * im_ref[:] + sn * ppre
    tlre = _xor_permute(plre_ref[:], xlo_ref[0], br)
    tlim = _xor_permute(plim_ref[:], xlo_ref[0], br)
    plre = s * (pr * tlre - pi * tlim)
    plim = s * (pr * tlim + pi * tlre)
    olre_ref[:] = c * lre_ref[:] - sn * plim
    olim_ref[:] = c * lim_ref[:] + sn * plre
    acc = contrib * jnp.where(
        (jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0) == 0)
        & (jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 1) == 0),
        jnp.float32(1.0),
        jnp.float32(0.0),
    )

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = acc

    @pl.when(i > 0)
    def _accum():
        acc_ref[:] = acc_ref[:] + acc


def adjoint_stream_pallas(psi_final, lam, n: int, xs, zs, angles, scales,
                          phre, phim):
    """Reverse adjoint sweep for states larger than VMEM; returns
    (psi0, lam0, contribs) exactly like adjoint_chain_pallas.

    ``xs``/``zs`` must be host numpy in REVERSED application order.  Four
    planes stream through half-size blocks (the cross kernel holds 8
    input + 4 output blocks, so blocks are shrunk to keep the working set
    inside VMEM); block-local runs chain in VMEM, block-crossing terms
    pair partner blocks.  Contributions come back in input (reversed-term)
    order -- runs partition the order sequentially.
    """
    if n < 11:
        raise ValueError("adjoint_stream_pallas needs at least 11 qubits")
    xs = np.asarray(xs, np.uint32)
    zs = np.asarray(zs, np.uint32)
    rows = (1 << n) // LANE
    br = max(8, _stream_block_rows(rows) // 2)
    bb = br.bit_length() - 1
    nb = rows // br
    nhi = max(n - LANE_BITS - bb, 0)
    re = jnp.real(psi_final).astype(jnp.float32).reshape(rows, LANE)
    im = jnp.imag(psi_final).astype(jnp.float32).reshape(rows, LANE)
    lre = jnp.real(lam).astype(jnp.float32).reshape(rows, LANE)
    lim = jnp.imag(lam).astype(jnp.float32).reshape(rows, LANE)
    cos = jnp.cos(angles).astype(jnp.float32)
    sin = jnp.sin(angles).astype(jnp.float32)
    scales = jnp.asarray(scales, jnp.float32)
    phre = jnp.asarray(phre, jnp.float32)
    phim = jnp.asarray(phim, jnp.float32)

    runs = _order_runs(xs, bb)

    smem = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 8
    blk = pl.BlockSpec((br, LANE), lambda i: (i, 0))
    plane = jax.ShapeDtypeStruct((rows, LANE), jnp.float32)
    acc_shape = jax.ShapeDtypeStruct((8, LANE), jnp.float32)
    acc_spec = pl.BlockSpec((8, LANE), lambda i: (0, 0))
    interp = jax.devices()[0].platform == "cpu"
    vals = []
    for xh, idx in runs:
        for lo in range(0, len(idx), CHAIN_CHUNK):
            part = np.asarray(idx[lo : lo + CHAIN_CHUNK])
            xlo, zlo, zhi = _run_chunk_masks(xs, zs, part, bb)
            args = (xlo, zlo, zhi, cos[part], sin[part], scales[part],
                    phre[part], phim[part])
            if xh == 0:
                re, im, lre, lim, acc = pl.pallas_call(
                    functools.partial(_adjoint_stream_local_kernel, nhi),
                    grid=(nb,),
                    out_shape=(plane, plane, plane, plane, acc_shape),
                    in_specs=smem + [blk] * 4,
                    out_specs=(blk, blk, blk, blk, acc_spec),
                    interpret=interp,
                )(*args, re, im, lre, lim)
                vals.append(acc.reshape(-1)[: len(part)])
            else:
                pblk = pl.BlockSpec((br, LANE), lambda i, _h=xh: (i ^ _h, 0))
                re, im, lre, lim, acc = pl.pallas_call(
                    functools.partial(_adjoint_stream_cross_kernel, nhi),
                    grid=(nb,),
                    out_shape=(plane, plane, plane, plane, acc_shape),
                    in_specs=smem + [blk] * 4 + [pblk] * 4,
                    out_specs=(blk, blk, blk, blk, acc_spec),
                    interpret=interp,
                )(*args, re, im, lre, lim, re, im, lre, lim)
                vals.append(acc.reshape(-1)[:1])
    psi0 = (re + 1j * im).astype(psi_final.dtype).reshape(psi_final.shape)
    lam0 = (lre + 1j * lim).astype(lam.dtype).reshape(lam.shape)
    return psi0, lam0, jnp.concatenate(vals)


def _rot_stream_local_kernel(
    nhi, xlo_ref, zlo_ref, zhi_ref, cos_ref, sin_ref, phre_ref, phim_ref,
    re_ref, im_ref, ore_ref, oim_ref,
):
    """A chain of BLOCK-LOCAL rotations streamed over the state: every
    rotation's flip mask stays inside one (br, LANE) block, so a whole run
    of consecutive local rotations costs ONE state read + write.  The
    z-mask may still touch block-index bits -- folded in as a per-term
    parity sign of (zhi & block_id)."""
    i = pl.program_id(0)
    br = re_ref.shape[0]
    T = xlo_ref.shape[0]

    def body(j, carry):
        re, im = carry
        tre = _xor_permute(re, xlo_ref[j], br)
        tim = _xor_permute(im, xlo_ref[j], br)
        s = _parity_sign(zlo_ref[j], br)
        s = _block_parity_flip(s, zhi_ref[j], i, nhi)
        pr = phre_ref[j]
        pi = phim_ref[j]
        pre = s * (pr * tre - pi * tim)
        pim = s * (pr * tim + pi * tre)
        c = cos_ref[j]
        sn = sin_ref[j]
        return (c * re + sn * pim, c * im - sn * pre)

    re, im = jax.lax.fori_loop(0, T, body, (re_ref[:], im_ref[:]))
    ore_ref[:] = re
    oim_ref[:] = im


def _rot_stream_cross_kernel(
    nhi, xlo_ref, zlo_ref, zhi_ref, cos_ref, sin_ref, phre_ref, phim_ref,
    re_ref, im_ref, pre_ref, pim_ref, ore_ref, oim_ref,
):
    """One BLOCK-CROSSING rotation: output block i combines its identity
    block (cos part) with the XOR-paired partner block i ^ xh (sin part)."""
    i = pl.program_id(0)
    br = re_ref.shape[0]
    tre = _xor_permute(pre_ref[:], xlo_ref[0], br)
    tim = _xor_permute(pim_ref[:], xlo_ref[0], br)
    s = _parity_sign(zlo_ref[0], br)
    s = _block_parity_flip(s, zhi_ref[0], i, nhi)
    pr = phre_ref[0]
    pi = phim_ref[0]
    ppre = s * (pr * tre - pi * tim)
    ppim = s * (pr * tim + pi * tre)
    c = cos_ref[0]
    sn = sin_ref[0]
    ore_ref[:] = c * re_ref[:] + sn * ppim
    oim_ref[:] = c * im_ref[:] - sn * ppre


def rotation_stream_pallas(psi, n: int, xs, zs, thetas, phre, phim):
    """Apply exp(-i theta_T P_T) ... exp(-i theta_0 P_0)|psi> for states
    larger than VMEM (chain_max < n <= stream_max).

    ``xs``/``zs`` must be host numpy (static partitioning): consecutive
    rotations whose flip masks stay inside one (br, LANE) block run as a
    VMEM-resident chain (one state pass per run); rotations crossing
    blocks each pair output block i with partner block i ^ xh (one state
    pass per such rotation).  On JW-mapped lattice circuits nearly all
    rotations are block-local, so HBM traffic approaches one state
    read + write per circuit layer instead of per rotation.
    """
    if n < 11:
        raise ValueError("rotation_stream_pallas needs at least 11 qubits")
    rows = (1 << n) // LANE
    re = jnp.real(psi).astype(jnp.float32).reshape(rows, LANE)
    im = jnp.imag(psi).astype(jnp.float32).reshape(rows, LANE)
    ore, oim = rotation_stream_planes(re, im, n, xs, zs, thetas, phre, phim)
    return (ore + 1j * oim).astype(psi.dtype).reshape(psi.shape)


def rotation_stream_planes(re, im, n: int, xs, zs, thetas, phre, phim):
    """Streaming rotation product on f32 (rows, LANE) planes directly
    (same contract as rotation_stream_pallas; planes in, planes out --
    for 26-30 qubit states never materialized in complex form)."""
    if n < 11:
        raise ValueError("rotation_stream_planes needs at least 11 qubits")
    xs = np.asarray(xs, np.uint32)
    zs = np.asarray(zs, np.uint32)
    rows, br, bb, nb, nhi, re, im, _ = _stream_setup_planes(re, im, n, xs)

    cos = jnp.cos(thetas).astype(jnp.float32)
    sin = jnp.sin(thetas).astype(jnp.float32)
    phre = jnp.asarray(phre, jnp.float32)
    phim = jnp.asarray(phim, jnp.float32)

    runs = _order_runs(xs, bb)  # xh == 0 -> local chain

    smem = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 7
    blk = pl.BlockSpec((br, LANE), lambda i: (i, 0))
    interp = jax.devices()[0].platform == "cpu"
    for xh, idx in runs:
        for lo in range(0, len(idx), CHAIN_CHUNK):
            part = np.asarray(idx[lo : lo + CHAIN_CHUNK])
            xlo, zlo, zhi = _run_chunk_masks(xs, zs, part, bb)
            args = (xlo, zlo, zhi, cos[part], sin[part], phre[part], phim[part])
            if xh == 0:
                re, im = pl.pallas_call(
                    functools.partial(_rot_stream_local_kernel, nhi),
                    grid=(nb,),
                    out_shape=(
                        jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
                        jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
                    ),
                    in_specs=smem + [blk, blk],
                    out_specs=(blk, blk),
                    interpret=interp,
                )(*args, re, im)
            else:
                re, im = pl.pallas_call(
                    functools.partial(_rot_stream_cross_kernel, nhi),
                    grid=(nb,),
                    out_shape=(
                        jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
                        jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
                    ),
                    in_specs=smem
                    + [
                        blk,
                        blk,
                        pl.BlockSpec((br, LANE), lambda i, _h=xh: (i ^ _h, 0)),
                        pl.BlockSpec((br, LANE), lambda i, _h=xh: (i ^ _h, 0)),
                    ],
                    out_specs=(blk, blk),
                    interpret=interp,
                )(*args, re, im, re, im)
    return re, im
