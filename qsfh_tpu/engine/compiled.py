"""Scan-compiled circuits: constant compile size in circuit depth.

The unrolled engine (one fused flip per Pauli rotation) gives the fastest
steady-state steps but its HLO size grows linearly with depth -- a 3x3
ADAPT step is ~12k equations, which remote TPU compile services handle
poorly (minutes, sometimes timeouts).  This module lowers a circuit to a
few homogeneous ``lax.scan`` segments whose bodies are uniform over gates:

* rot segment   -- per-Pauli-term arrays (flip mask, phase mask, scale,
                   parameter index, string phase); body = ONE generic
                   exp(-i theta P) with the flip-by-traced-mask expressed
                   as n conditional single-bit flips (both branches are
                   cheap static flips; `where` keeps it branchless)
* u4 segment    -- static two-qubit gates as (T, 4, 4, 2) real arrays +
                   single-bit wire masks; body = 4 XOR-shifted fused
                   multiply-adds (same math as the sharded engine)
* rzlayer/diag  -- single fused elementwise ops (not scanned)

Program size: O(segment kinds), not O(depth).  Gradients come from an
adjoint custom_vjp (reverse scans replaying inverse gates, two live
statevectors) instead of scan residuals, so memory is O(1) in depth too.

Circuit programs reuse the op format of :mod:`qsfh_tpu.grad.adjoint`:
("rot", rot_terms, param_idx) and ("fixed", tag, payload).
"""

from __future__ import annotations

import os
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .gates import _xor_flip, static_rz_layer_phases
from .state import const_complex, index_bits, qmask_to_bmask, real_dtype


_LANE = 128
_LANE_BITS = 7


def xor_flip_traced(psi: jnp.ndarray, n: int, xb) -> jnp.ndarray:
    """t[b] = psi[b ^ xb] for a TRACED flat mask xb.

    TPU-layout-aware lowering: the state is viewed as (rows, 128) so every
    intermediate keeps a full 128 lane axis (TPU tiles pad the last two
    dims to (8, 128) -- naive per-bit reshapes with tiny trailing dims
    inflate memory traffic by up to 128x).  The low 7 mask bits apply as
    ONE XOR-permutation matmul over the lane axis (MXU); the row bits as a
    cascade of conditional reversals with the lane axis intact.  No
    gathers (TPU gathers serialize), no dynamic shapes.
    """
    xb = jnp.asarray(xb, dtype=jnp.uint32)
    if jax.default_backend() == "cpu":
        # CPU executes gathers efficiently (TPU serializes them): one pass
        idx = index_bits(n)
        return jnp.take(psi, (idx ^ xb).astype(jnp.int32), axis=0)
    if n < _LANE_BITS:
        out = psi
        for p in range(n):
            flipped = _xor_flip(out, n, 1 << p)
            bit = (xb >> np.uint32(p)) & np.uint32(1)
            out = jnp.where(bit.astype(bool), flipped, out)
        return out

    rows = (1 << n) // _LANE
    a2 = psi.reshape(rows, _LANE)

    # lane bits: permutation matmul P[i, j] = [i ^ j == lane_mask]
    # (real-plane matmuls -- complex matmul is not universally lowered)
    from .state import real_dtype as _rdt_of

    lane_mask = xb & np.uint32(_LANE - 1)
    ii = jax.lax.broadcasted_iota(jnp.uint32, (_LANE, _LANE), 0)
    jj = jax.lax.broadcasted_iota(jnp.uint32, (_LANE, _LANE), 1)
    P = ((ii ^ jj) == lane_mask).astype(_rdt_of(psi.dtype))
    a2 = (jnp.real(a2) @ P + 1j * (jnp.imag(a2) @ P)).astype(psi.dtype)

    # row bits: conditional reversal, trailing dims stay (2, B*128)
    row_mask = xb >> np.uint32(_LANE_BITS)
    for p in range(max(n - _LANE_BITS, 0)):
        A = rows >> (p + 1)
        v = a2.reshape(A, 2, (1 << p) * _LANE)
        bit = (row_mask >> np.uint32(p)) & np.uint32(1)
        a2 = jnp.where(bit.astype(bool), jnp.flip(v, axis=1), v).reshape(rows, _LANE)
    return a2.reshape(psi.shape)


def givens_network_static_ops(n_qubits: int, diagonal, decomposition):
    """The Slater/FT Givens network as STATIC Pauli rotations.

    Every plan op decomposes exactly into commuting Pauli rotations:
      RZ(phi) on q            = exp(-i phi/2 Z_q)
      SingleExcitation(2t)    = exp(-i t/2 Y_i X_j) exp(+i t/2 X_i Y_j)
      PauliX ('pht')          = i * exp(-i pi/2 X_q)
    so the whole circuit becomes ONE homogeneous rot segment (static angles
    ride as scale with param index -1 -> an appended constant 1.0), instead
    of a separate dense-4x4 scan -- the single-segment program is what
    fragile remote compile services digest best.

    Returns (ops, global_phase): energies and fidelities are phase-free,
    but apply() multiplies the phase back for exact state parity.
    """
    ops: List[tuple] = []
    n_pht = 0
    for i in range(n_qubits):
        ang = float(np.angle(diagonal[i]))
        if ang != 0.0:
            ops.append(("rot", ((0, 1 << i, ang / 2.0),), -1))
    for parallel_ops in reversed(decomposition):
        for op in parallel_ops:
            if op == "pht":
                q = n_qubits - 1
                ops.append(("rot", ((1 << q, 0, np.pi / 2.0),), -1))
                n_pht += 1
            else:
                i, j, theta, phi = op
                both = (1 << i) | (1 << j)
                ops.append(
                    (
                        "rot",
                        (
                            (both, 1 << i, float(theta) / 2.0),  # Y_i X_j
                            (both, 1 << j, -float(theta) / 2.0),  # X_i Y_j
                        ),
                        -1,
                    )
                )
                if float(phi) != 0.0:
                    ops.append(("rot", ((0, 1 << j, float(phi) / 2.0),), -1))
    return ops, (1j) ** (n_pht % 4)


# -- program lowering -----------------------------------------------------------


class Segment:
    __slots__ = ("kind", "data")

    def __init__(self, kind: str, data):
        self.kind = kind
        self.data = data


def lower_program(ops: Sequence[tuple], n: int) -> List[Segment]:
    """Group a gate program into homogeneous scan segments."""
    segments: List[Segment] = []
    rot_buf: List[tuple] = []
    u4_buf: List[tuple] = []

    def flush_rot():
        if not rot_buf:
            return
        xs, zs, scales, pidx, phre, phim = [], [], [], [], [], []
        for (x, z, scale, k) in rot_buf:
            xs.append(qmask_to_bmask(x, n))
            zs.append(qmask_to_bmask(z, n))
            scales.append(scale)
            pidx.append(k)
            ph = (-1j) ** (bin(x & z).count("1") % 4)
            phre.append(ph.real)
            phim.append(ph.imag)
        segments.append(
            Segment(
                "rot",
                dict(
                    xb=np.asarray(xs, np.uint32),
                    zb=np.asarray(zs, np.uint32),
                    scale=np.asarray(scales, np.float64),
                    pidx=np.asarray(pidx, np.int32),
                    phre=np.asarray(phre, np.float64),
                    phim=np.asarray(phim, np.float64),
                ),
            )
        )
        rot_buf.clear()

    def flush_u4():
        if not u4_buf:
            return
        fa, fb, mats = [], [], []
        for (M, qa, qb) in u4_buf:
            Ma = np.asarray(M, dtype=np.complex128).reshape(4, 4)
            if qa > qb:
                Ma = Ma.reshape(2, 2, 2, 2).transpose(1, 0, 3, 2).reshape(4, 4)
                qa, qb = qb, qa
            fa.append(1 << (n - 1 - qa))
            fb.append(1 << (n - 1 - qb))
            mats.append(np.stack([Ma.real, Ma.imag], axis=-1))
        segments.append(
            Segment(
                "u4",
                dict(
                    fa=np.asarray(fa, np.uint32),
                    fb=np.asarray(fb, np.uint32),
                    U=np.asarray(mats, np.float64),  # (T, 4, 4, 2)
                ),
            )
        )
        u4_buf.clear()

    for op in ops:
        if op[0] == "rot":
            flush_u4()
            _, rot_terms, k = op
            for (x, z, scale) in rot_terms:
                rot_buf.append((x, z, scale, k))
        elif op[0] == "fixed":
            _, tag, payload = op
            if tag == "u4":
                flush_rot()
                flat, i, j = payload
                u4_buf.append((np.array(flat).reshape(4, 4), i, j))
            elif tag == "se":
                flush_rot()
                ang, i, j = payload
                c, s = np.cos(ang / 2), np.sin(ang / 2)
                M = np.array(
                    [[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]],
                    dtype=np.complex128,
                )
                u4_buf.append((M, i, j))
            elif tag == "x":
                flush_rot()
                q = payload[0]
                M = np.array([[0, 1], [1, 0]], dtype=np.complex128)
                # lift to a u4 on (q, partner) to stay in the segment
                partner = q - 1 if q > 0 else q + 1
                u4_buf.append((np.kron(np.eye(2), M) if partner < q else np.kron(M, np.eye(2)), min(partner, q), max(partner, q)))
            elif tag in ("rz", "rzlayer"):
                flush_rot()
                flush_u4()
                if tag == "rz":
                    phi, q = payload
                    angles = [0.0] * n
                    angles[q] = phi
                else:
                    angles = list(payload)
                segments.append(Segment("rzlayer", tuple(angles)))
            else:
                raise ValueError(f"unknown fixed tag {tag}")
        elif op[0] == "diag":
            flush_rot()
            flush_u4()
            _, weights, k = op
            segments.append(Segment("diag", (np.asarray(weights), k)))
        else:
            raise ValueError(f"unknown op {op}")
    flush_rot()
    flush_u4()
    return segments


# -- forward execution -----------------------------------------------------------


def _sign_plane(idx, zb, n, rdt):
    """(-1)^{popcount(b & zb)} over the flat index space, traced zb.

    For n >= 7 the parity is separable over the TPU (rows, 128) layout --
    srow(row bits) x slane(lane bits) -- so the bit-loops run on a
    (rows, 1) column and a (1, 128) row and the plane costs ONE broadcast
    multiply, vs ~4 full-plane ops for the popcount form (same trick as
    pallas_kernels._parity_sign, here for the XLA scan bodies)."""
    if n >= _LANE_BITS:
        rows = (1 << n) >> _LANE_BITS
        row_ids = jax.lax.broadcasted_iota(jnp.uint32, (rows, 1), 0)
        lane_ids = jax.lax.broadcasted_iota(jnp.uint32, (1, _LANE), 1)
        rmask = row_ids & (zb >> np.uint32(_LANE_BITS))
        lmask = lane_ids & (zb & np.uint32(_LANE - 1))
        rpar = jnp.zeros((rows, 1), jnp.uint32)
        for t in range(n - _LANE_BITS):
            rpar = rpar ^ ((rmask >> np.uint32(t)) & np.uint32(1))
        lpar = jnp.zeros((1, _LANE), jnp.uint32)
        for t in range(_LANE_BITS):
            lpar = lpar ^ ((lmask >> np.uint32(t)) & np.uint32(1))
        srow = 1.0 - 2.0 * rpar.astype(rdt)
        slane = 1.0 - 2.0 * lpar.astype(rdt)
        return (srow * slane).reshape(idx.shape)
    par = jax.lax.population_count(idx & zb) & jnp.uint32(1)
    return 1.0 - 2.0 * par.astype(rdt)


def _rot_body(n, rdt):
    # NOTE: run_segments routes pallas-eligible circuits to the whole-
    # segment chain/stream kernels BEFORE falling back to this scan body,
    # so no per-term pallas branch belongs here (one existed and was
    # unreachable -- its gate condition was identical to the caller's).
    idx = index_bits(n)

    def body(psi, term):
        xb, zb, scale, pidx, phre, phim, thetas = term
        theta = thetas * scale  # thetas already gathered per term
        s = _sign_plane(idx, zb, n, rdt)
        t = xor_flip_traced(psi, n, xb)
        ph = (phre + 1j * phim).astype(psi.dtype)
        ppsi = ph * s.astype(psi.dtype) * t
        c = jnp.cos(theta).astype(psi.dtype)
        sn = jnp.sin(theta).astype(psi.dtype)
        return c * psi - 1j * sn * ppsi, None

    return body


def _grouping_enabled() -> bool:
    """Fuse consecutive commuting same-flip rotations into ONE closed-form
    pair rotation per group (QSFH_GROUP_ROT=0 disables).

    All ~8 JW Pauli strings of one two-body pool generator share the same
    x-mask and mutually commute (their Y-count parities are equal), so
    their Trotter product EQUALS exp(-i theta * sum_k scale_k P_k) -- a
    single amplitude-pair mixing with per-pair weight m(b).  This cuts the
    XLA rot-scan length ~8x, which is the flagship 18q adjoint bottleneck
    (measured 0.64 ms/term; the per-term flip matmuls dominate)."""
    return os.environ.get("QSFH_GROUP_ROT", "1") == "1"


def _group_rot_terms(xb, zb, scale, pidx, phre, phim, cap: int = 16):
    """Host-side grouping of rot terms (IN EXECUTION ORDER) into maximal
    consecutive runs sharing (x-mask, parameter index, parity(x&z)).

    Two same-x strings commute iff popcount(x & (z1^z2)) is even, i.e.
    iff parity(popcount(x&z)) agrees -- so every run is mutually
    commuting and the fused closed form is EXACT, not Trotterized.
    Returns None when nothing fuses (every group is a singleton), else
    padded arrays (gxb (G,), gpidx (G,), gzb/gscale/gphre/gphim (G, S));
    padding has scale=0 (contributes nothing to m).
    """
    T = len(xb)
    par = [(int(x) & int(z)).bit_count() & 1 for x, z in zip(xb, zb)]
    groups: List[List[int]] = []
    key = None
    for t in range(T):
        kt = (int(xb[t]), int(pidx[t]), par[t])
        if kt == key and len(groups[-1]) < cap:
            groups[-1].append(t)
        else:
            groups.append([t])
            key = kt
    G = len(groups)
    if G == T:
        return None
    S = max(len(g) for g in groups)
    gxb = np.zeros(G, np.uint32)
    gpidx = np.zeros(G, np.int32)
    gzb = np.zeros((G, S), np.uint32)
    gscale = np.zeros((G, S), np.float64)
    gphre = np.zeros((G, S), np.float64)
    gphim = np.zeros((G, S), np.float64)
    for gi, g in enumerate(groups):
        gxb[gi] = xb[g[0]]
        gpidx[gi] = pidx[g[0]]
        for si, t in enumerate(g):
            gzb[gi, si] = zb[t]
            gscale[gi, si] = scale[t]
            gphre[gi, si] = phre[t]
            gphim[gi, si] = phim[t]
    return dict(xb=gxb, pidx=gpidx, zb=gzb, scale=gscale,
                phre=gphre, phim=gphim, n_sub=S, n_groups=G)


def _sep_sign_factors(zbs, n, rdt):
    """Separable sign factors for traced z-masks ``zbs`` (S,).

    s_k(b) = (-1)^{popcount(b & z_k)} factors over the (rows, 128) index
    plane as srow (rows, S) x slane (S, 128): the parity bit-loops run on
    (rows, S) and (S, 128) grids -- ~128x less work than the full-plane
    popcount form when S << 128 -- and the weighted sum over k becomes an
    MXU matmul (see :func:`_group_weight`)."""
    S = zbs.shape[0]
    rows = (1 << n) >> _LANE_BITS
    row_ids = jax.lax.broadcasted_iota(jnp.uint32, (rows, 1), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.uint32, (1, _LANE), 1)
    rmask = row_ids & (zbs >> np.uint32(_LANE_BITS))[None, :]  # (rows, S)
    lmask = (zbs & np.uint32(_LANE - 1))[:, None] & lane_ids  # (S, 128)
    rpar = jnp.zeros((rows, S), jnp.uint32)
    for t in range(max(n - _LANE_BITS, 0)):
        rpar = rpar ^ ((rmask >> np.uint32(t)) & np.uint32(1))
    lpar = jnp.zeros((S, _LANE), jnp.uint32)
    for t in range(_LANE_BITS):
        lpar = lpar ^ ((lmask >> np.uint32(t)) & np.uint32(1))
    srow = 1.0 - 2.0 * rpar.astype(rdt)
    slane = 1.0 - 2.0 * lpar.astype(rdt)
    return srow, slane


def _group_weight(idx, zbs, scales, phres, phims, rdt, n=None):
    """m(b) = sum_k scale_k * ph_k * s_k(b) for one group (S static).

    For n >= 7 the signs are SEPARABLE -- s_k(b) = srow_k(row bits) *
    slane_k(lane bits) -- so the weighted sum collapses into two tiny
    (rows, S) @ (S, 128) matmuls (HIGHEST precision; exact +-1 factors)
    instead of S full-plane popcount+FMA passes.  At 18q / S=16 that cuts
    the group body's plane traffic ~6x, which dominates the XLA adjoint
    scan the flagship trains through (measured ~1 ms/group before)."""
    S = zbs.shape[0]
    if n is not None and n >= _LANE_BITS:
        srow, slane = _sep_sign_factors(zbs, n, rdt)
        prec = jax.lax.Precision.HIGHEST
        mre = jnp.dot(srow * (scales * phres)[None, :], slane,
                      precision=prec).reshape(idx.shape)
        mim = jnp.dot(srow * (scales * phims)[None, :], slane,
                      precision=prec).reshape(idx.shape)
        return mre, mim
    mre = jnp.zeros(idx.shape, rdt)
    mim = jnp.zeros(idx.shape, rdt)
    for k in range(S):  # static unroll; S <= 16
        parb = jax.lax.population_count(idx & zbs[k]) & jnp.uint32(1)
        s = (1.0 - 2.0 * parb.astype(rdt)) * scales[k]
        mre = mre + phres[k] * s
        mim = mim + phims[k] * s
    return mre, mim


def _grot_mix(theta, mre, mim, rdt):
    """cos/sinc factors of exp(-i theta M): returns (c, f) with the pair
    update psi' = c*psi -+ 1j*f*(mre+1j*mim)*psi[b^X]."""
    a2 = mre * mre + mim * mim
    a = jnp.sqrt(a2)
    ta = theta * a
    c = jnp.cos(ta)
    # sin(theta*a)/a -> theta as a -> 0 (m==0 there, so any finite value
    # is safe; keep the limit for clarity)
    f = jnp.where(a > 0, jnp.sin(ta) / jnp.where(a > 0, a, 1.0), theta)
    return c, f


def _grot_body(n, rdt):
    """Grouped rotation scan body: one flip per commuting group."""
    idx = index_bits(n)

    def body(psi, term):
        xb, zbs, scales, phres, phims, theta = term
        mre, mim = _group_weight(idx, zbs, scales, phres, phims, rdt, n)
        c, f = _grot_mix(theta, mre, mim, rdt)
        t = xor_flip_traced(psi, n, xb)
        mc = (mre + 1j * mim).astype(psi.dtype)
        return c.astype(psi.dtype) * psi - 1j * f.astype(psi.dtype) * mc * t, None

    return body


def _u4_body(n, rdt):
    idx = index_bits(n)

    def body(psi, gate):
        fa, fb, U = gate  # U: (4, 4, 2) real
        ba = ((idx & fa) != 0).astype(rdt)
        bb = ((idx & fb) != 0).astype(rdt)
        pa = _xor_flip_onebit(psi, n, fa)
        pb = _xor_flip_onebit(psi, n, fb)
        pab = _xor_flip_onebit(pa, n, fb)
        copies = ((0, 0, psi), (1, 0, pa), (0, 1, pb), (1, 1, pab))
        out = jnp.zeros_like(psi)
        Uc = (U[..., 0] + 1j * U[..., 1]).astype(psi.dtype)
        for (da, db, shift) in copies:
            coeff = jnp.zeros(psi.shape, dtype=psi.dtype)
            for ra in (0, 1):
                for rb in (0, 1):
                    u = Uc[2 * ra + rb, 2 * (ra ^ da) + (rb ^ db)]
                    ind = (ba if ra else (1.0 - ba)) * (bb if rb else (1.0 - bb))
                    coeff = coeff + u * ind.astype(psi.dtype)
            out = out + coeff * shift
        return out, None

    return body


def _xor_flip_onebit(psi, n, fmask) -> jnp.ndarray:
    """psi[b ^ fmask] for a traced SINGLE-BIT flat mask."""
    return xor_flip_traced(psi, n, fmask)


def run_segments(segments, psi, thetas, n, direction: int = 1):
    """Execute the program (direction=-1: exact inverse, reversed order)."""
    rdt = real_dtype(psi.dtype)
    seq = segments if direction == 1 else list(reversed(segments))
    # static-angle rot terms carry param index -1 -> an appended constant 1.0
    n_params = thetas.shape[0]
    thetas_ext = jnp.concatenate([thetas, jnp.ones(1, dtype=thetas.dtype)])
    for seg in seq:
        if seg.kind == "rot":
            d = seg.data
            pidx_arr = np.where(d["pidx"] < 0, n_params, d["pidx"])
            th = _select_params(thetas_ext, pidx_arr) * direction
            xs = (
                jnp.asarray(d["xb"]),
                jnp.asarray(d["zb"]),
                jnp.asarray(d["scale"], rdt),
                jnp.asarray(d["pidx"]),
                jnp.asarray(d["phre"], rdt),
                jnp.asarray(d["phim"], rdt),
                th.astype(rdt),
            )
            if direction == -1:
                xs = tuple(x[::-1] for x in xs)
            from .pallas_kernels import (
                chain_max_qubits,
                pallas_enabled,
                stream_max_qubits,
            )

            if pallas_enabled() and 10 <= n <= chain_max_qubits() and rdt == jnp.float32:
                # whole-segment chain kernel: state stays VMEM-resident
                # across all terms (2 HBM plane transfers per 256-term
                # chunk instead of per rotation)
                from .pallas_kernels import pauli_chain_pallas

                psi = pauli_chain_pallas(
                    psi, n, xs[0], xs[1], xs[6] * xs[2], xs[4], xs[5]
                )
            elif (
                pallas_enabled()
                # max(..., 11): a lowered chain cap must fall back to the
                # XLA scan below 11 qubits, the streaming kernels' floor
                and max(chain_max_qubits(), 10) < n <= stream_max_qubits()
                and rdt == jnp.float32
            ):
                # beyond the VMEM cap: HBM-streaming rotations (block-local
                # runs chain in VMEM, block-crossing rotations pair partner
                # blocks); masks must be host numpy for static partitioning
                from .pallas_kernels import rotation_stream_pallas

                step = -1 if direction == -1 else 1
                psi = rotation_stream_pallas(
                    psi, n,
                    np.asarray(d["xb"])[::step],
                    np.asarray(d["zb"])[::step],
                    xs[6] * xs[2],
                    np.asarray(d["phre"])[::step],
                    np.asarray(d["phim"])[::step],
                )
            else:
                grp = None
                if _grouping_enabled():
                    step = -1 if direction == -1 else 1
                    grp = _group_rot_terms(
                        np.asarray(d["xb"])[::step], np.asarray(d["zb"])[::step],
                        np.asarray(d["scale"])[::step] * direction,
                        np.asarray(d["pidx"])[::step],
                        np.asarray(d["phre"])[::step],
                        np.asarray(d["phim"])[::step],
                    )
                if grp is not None:
                    th_g = _select_params(
                        thetas_ext,
                        np.where(grp["pidx"] < 0, n_params, grp["pidx"]),
                    ).astype(rdt)
                    gxs = (
                        jnp.asarray(grp["xb"]),
                        jnp.asarray(grp["zb"]),
                        jnp.asarray(grp["scale"], rdt),
                        jnp.asarray(grp["phre"], rdt),
                        jnp.asarray(grp["phim"], rdt),
                        th_g,
                    )
                    psi, _ = jax.lax.scan(_grot_body(n, rdt), psi, gxs)
                else:
                    psi, _ = jax.lax.scan(_rot_body(n, rdt), psi, xs)
        elif seg.kind == "u4":
            d = seg.data
            U = jnp.asarray(d["U"], rdt)
            if direction == -1:
                # inverse = conj transpose of each gate, reversed order
                U = jnp.flip(
                    jnp.stack(
                        [jnp.swapaxes(U[..., 0], 1, 2), -jnp.swapaxes(U[..., 1], 1, 2)],
                        axis=-1,
                    ),
                    axis=0,
                )
                fa = jnp.asarray(d["fa"])[::-1]
                fb = jnp.asarray(d["fb"])[::-1]
            else:
                fa = jnp.asarray(d["fa"])
                fb = jnp.asarray(d["fb"])
            psi, _ = jax.lax.scan(_u4_body(n, rdt), psi, (fa, fb, U))
        elif seg.kind == "rzlayer":
            angles = [direction * a for a in seg.data]
            phases = static_rz_layer_phases(angles, n)
            psi = psi * const_complex(phases, psi.dtype)
        elif seg.kind == "diag":
            weights, k = seg.data
            D = jnp.asarray(weights, rdt)
            theta = (thetas[k] * direction).astype(rdt)
            psi = psi * (jnp.cos(theta * D) - 1j * jnp.sin(theta * D)).astype(psi.dtype)
        else:  # pragma: no cover
            raise ValueError(seg.kind)
    return psi


def _onehot_rows(pidx_host, width: int, dtype) -> jnp.ndarray:
    """(T, width) one-hot rows built IN-PROGRAM from a T-int32 literal.

    Host-materializing the one-hot embeds a T x width float literal in
    the HLO.  At the flagship 3x3 ansatz (727 params, ~6k rotation
    terms) that is 17-35 MB PER STAGE INSTANCE, and a K-unrolled fused
    step carried hundreds of MB of literals -- jax spent tens of minutes
    just hashing them at trace time (round-3 finding).  The iota-compare
    form keeps the literal at T int32s (~24 KB) and lowers as a 2-D
    compare + MXU matmul, both shape classes the tunneled backend
    accepts (cf. engine.state.basis_state).
    """
    pidx = jnp.asarray(np.asarray(pidx_host, np.int32))
    cols = jax.lax.broadcasted_iota(jnp.int32, (pidx.shape[0], width), 1)
    return (pidx[:, None] == cols).astype(dtype)


def _select_params(thetas_ext, pidx_host):
    """``thetas_ext[pidx]`` without a gather.

    The tunneled TPU backend rejects gather lowerings outright -- a
    13-element constant-index gather is UNIMPLEMENTED on its own
    (benchmarks/tpu_bisect_fwd2.jsonl, rung "gather") -- so per-term
    angles are selected by a one-hot matmul (rows built in-program,
    see :func:`_onehot_rows`), which lowers to the MXU.
    """
    sel = _onehot_rows(pidx_host, thetas_ext.shape[0], thetas_ext.dtype)
    return sel @ thetas_ext


def run_rot_adjoint(segment: Segment, psi_final, lam, thetas, n):
    """Adjoint sweep over ONE rot segment: returns (psi0, lam0, grads).

    Reverse scan with carry (psi, lam, grads): at each term (reversed),
    grad[pidx] += scale * Im <lam | P psi>  evaluated at the state AFTER
    the gate, then both psi and lam are inverse-rotated.  Memory is O(1)
    in depth (two live statevectors), and the program is one scan.
    """
    rdt = real_dtype(psi_final.dtype)
    d = segment.data
    n_params = thetas.shape[0]
    thetas_ext = jnp.concatenate([thetas, jnp.ones(1, dtype=thetas.dtype)])
    pidx_host = np.where(d["pidx"] < 0, n_params, d["pidx"])
    th = _select_params(thetas_ext, pidx_host)

    from .pallas_kernels import (
        adjoint_chain_max_qubits,
        pallas_enabled,
        stream_max_qubits,
    )

    in_chain = 10 <= n <= adjoint_chain_max_qubits()
    # max(..., 10): with a lowered chain cap, n = 10 must use the XLA
    # fallback (the streaming kernels raise below 11 qubits)
    in_stream = max(adjoint_chain_max_qubits(), 10) < n <= stream_max_qubits()
    if pallas_enabled() and (in_chain or in_stream) and rdt == jnp.float32:
        # VMEM-resident chained reverse sweep (or HBM-streaming beyond the
        # VMEM cap); per-term contributions are accumulated by parameter
        # index outside the kernel
        from .pallas_kernels import adjoint_chain_pallas, adjoint_stream_pallas

        angle = (th.astype(rdt) * jnp.asarray(d["scale"], rdt))[::-1]
        kernel = adjoint_chain_pallas if in_chain else adjoint_stream_pallas
        psi0, lam0, contribs = kernel(
            psi_final,
            lam,
            n,
            np.asarray(d["xb"])[::-1] if in_stream else jnp.asarray(d["xb"])[::-1],
            np.asarray(d["zb"])[::-1] if in_stream else jnp.asarray(d["zb"])[::-1],
            angle,
            jnp.asarray(d["scale"], rdt)[::-1],
            jnp.asarray(d["phre"], rdt)[::-1],
            jnp.asarray(d["phim"], rdt)[::-1],
        )
        # accumulate per-term contributions by parameter index with the
        # transposed one-hot matmul (scatter-free, see _select_params)
        rsel = _onehot_rows(pidx_host[::-1], n_params + 1, contribs.dtype)
        grads = contribs @ rsel
        return psi0, lam0, grads[:n_params].astype(rdt)

    idx = index_bits(n)

    grp = None
    if _grouping_enabled():
        grp = _group_rot_terms(
            np.asarray(d["xb"])[::-1], np.asarray(d["zb"])[::-1],
            np.asarray(d["scale"])[::-1], np.asarray(d["pidx"])[::-1],
            np.asarray(d["phre"])[::-1], np.asarray(d["phim"])[::-1],
        )
    if grp is not None:
        # fused commuting groups: ONE flip of psi and of lam per group
        # instead of per Pauli term, and the whole group's gradient is
        # Im<lam| M |psi> at the group boundary (exact -- the per-term
        # chain-rule contributions telescope because the terms commute)
        gpidx_host = np.where(grp["pidx"] < 0, n_params, grp["pidx"])
        th_g = _select_params(thetas_ext, gpidx_host).astype(rdt)
        gxs = (
            jnp.asarray(grp["xb"]),
            jnp.asarray(grp["zb"]),
            jnp.asarray(grp["scale"], rdt),
            jnp.asarray(grp["phre"], rdt),
            jnp.asarray(grp["phim"], rdt),
            th_g,
            _onehot_rows(gpidx_host, n_params + 1, rdt),
        )

        def gbody(carry, term):
            psi, lam, grads = carry
            xb, zbs, scales, phres, phims, theta, krow = term
            mre, mim = _group_weight(idx, zbs, scales, phres, phims, rdt, n)
            mc = (mre + 1j * mim).astype(psi.dtype)
            # gradient at the post-gate state: Im <lam| M |psi>
            mpsi = mc * xor_flip_traced(psi, n, xb)
            contrib = jnp.imag(jnp.vdot(lam, mpsi)).astype(rdt)
            grads = grads + contrib * krow
            # inverse-rotate both carriers: exp(+i theta M)
            c, f = _grot_mix(theta, mre, mim, rdt)
            cc_ = c.astype(psi.dtype)
            ff = f.astype(psi.dtype)
            psi = cc_ * psi + 1j * ff * mpsi
            lam = cc_ * lam + 1j * ff * mc * xor_flip_traced(lam, n, xb)
            return (psi, lam, grads), None

        grads0 = jnp.zeros(n_params + 1, dtype=rdt)
        (psi0, lam0, grads), _ = jax.lax.scan(
            gbody, (psi_final, lam, grads0), gxs
        )
        return psi0, lam0, grads[:n_params]

    xs = (
        jnp.asarray(d["xb"])[::-1],
        jnp.asarray(d["zb"])[::-1],
        (th * jnp.asarray(d["scale"], thetas.dtype))[::-1],
        _onehot_rows(pidx_host[::-1], n_params + 1, rdt),
        jnp.asarray(d["scale"], rdt)[::-1],
        jnp.asarray(d["phre"], rdt)[::-1],
        jnp.asarray(d["phim"], rdt)[::-1],
    )

    def body(carry, term):
        psi, lam, grads = carry
        xb, zb, angle, krow, scale, phre, phim = term
        s = _sign_plane(idx, zb, n, rdt)
        ph = (phre + 1j * phim).astype(psi.dtype)
        # gradient at the post-gate state: Im <lam| scale*P |psi>
        ppsi = ph * s.astype(psi.dtype) * xor_flip_traced(psi, n, xb)
        contrib = scale * jnp.imag(jnp.vdot(lam, ppsi)).astype(rdt)
        # scatter-free accumulation: the backend rejects gather/scatter
        # lowerings (see _select_params), a one-hot FMA row does not
        grads = grads + contrib * krow
        # inverse-rotate both carriers:  exp(+i angle P)
        c = jnp.cos(angle).astype(psi.dtype)
        sn = jnp.sin(angle).astype(psi.dtype)
        psi = c * psi + 1j * sn * ppsi
        plam = ph * s.astype(psi.dtype) * xor_flip_traced(lam, n, xb)
        lam = c * lam + 1j * sn * plam
        return (psi, lam, grads), None

    grads0 = jnp.zeros(n_params + 1, dtype=rdt)
    (psi0, lam0, grads), _ = jax.lax.scan(body, (psi_final, lam, grads0), xs)
    return psi0, lam0, grads[:n_params]


class CompiledCircuit:
    """ops -> scan segments, with unrolled-engine-equivalent semantics."""

    def __init__(self, ops: Sequence[tuple], n_qubits: int, global_phase: complex = 1.0):
        self.n = n_qubits
        self.segments = lower_program(ops, n_qubits)
        self.global_phase = complex(global_phase)

    def _phased(self, psi, phase):
        if phase == 1.0:
            return psi
        return psi * const_complex(phase, psi.dtype)

    def apply(self, psi, thetas):
        out = run_segments(self.segments, psi, thetas, self.n)
        return self._phased(out, self.global_phase)

    def apply_inverse(self, psi, thetas):
        out = run_segments(self.segments, psi, thetas, self.n, direction=-1)
        return self._phased(out, np.conj(self.global_phase))
