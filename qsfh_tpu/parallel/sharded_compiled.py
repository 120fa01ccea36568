"""Scan-compiled lowering for the sharded engine: constant-size programs.

The unrolled sharded ADAPT step (one op per gate, ~400 collective-bearing
ops at 24 qubits) compiles for ~35 minutes on the virtual CPU mesh and
would blow straight through a real TPU compile service's ~100 s ceiling at
4x4 = 32 qubits.  This module shrinks the program to O(#generators +
#cross-shard gates) scan segments:

* **Generator rotations scan.**  Every JW string of one scattering
  generator i(c†c†cc − h.c.) flips the SAME set of modes — the packed
  x-mask is identical across its terms, only the z-mask varies.  So a
  generator lowers to ONE ``lax.scan`` whose body does a STATIC flip
  (local XOR + at most one static-partner collective permute) and
  traced z-parity signs — compile size O(1) per generator, runtime
  identical to the unrolled form.
* **Givens-network scan.**  Plan gates whose two wires are both
  shard-local (the vast majority: cross-shard gates touch only the k
  sharded qubits) batch into homogeneous u4 scans with traced single-bit
  masks (reusing the single-chip scan body on the local shard); the few
  cross-shard gates stay unrolled with static ppermutes, preserving
  execution order.

Everything supports exact inverse execution (reverse order, negated
angles / conjugate-transposed gates) for the O(1)-memory adjoint gradient.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.compiled import _u4_body, xor_flip_traced
from ..engine.gates import givens_plan_matrix
from ..engine.state import real_dtype
from .shmap_engine import AMP_AXIS, ShardedPauliEngine, _split_mask_flat, _xor_ppermute


# -- generator rotation scans -----------------------------------------------------


def pack_generator(
    engine: ShardedPauliEngine, rot_terms, allow_noncommuting: bool = False
) -> List[tuple]:
    """Pack a generator's (x, z, scale) terms into CONTIGUOUS same-x runs.

    Returns [(x_qmask, zb_flat[], scale[], phre[], phim[])] in original term
    order -- rotations of non-commuting strings are order-sensitive, so
    terms are never reordered across runs; for the pool/hopping generators
    (every JW string flips the same modes) this is a single run.

    By default REQUIRES the generator's strings to mutually commute:
    ``adjoint_energy_grads`` evaluates each slot's gradient as
    Im<lam|G|psi> at the post-slot state, which is exact only under that
    condition (the single-chip ``run_rot_adjoint`` replays per term and has
    no such requirement).  Every pool/HVA/Coulomb generator in the framework
    commutes internally; pass ``allow_noncommuting=True`` only for
    forward-only Trotter products that never feed the sharded adjoint.
    """
    _check_mask_widths(engine)
    terms_list = [(int(x), int(z)) for (x, z, _s) in rot_terms]
    if not allow_noncommuting:
        for i in range(len(terms_list)):
            xa, za = terms_list[i]
            for j in range(i + 1, len(terms_list)):
                xb, zb = terms_list[j]
                if (bin(xa & zb).count("1") + bin(xb & za).count("1")) % 2:
                    raise ValueError(
                        "pack_generator: strings "
                        f"(x={xa:#x},z={za:#x}) and (x={xb:#x},z={zb:#x}) "
                        "anticommute; the sharded adjoint gradient would be "
                        "wrong for this generator. Pass "
                        "allow_noncommuting=True only for forward-only use."
                    )
    runs: List[tuple] = []
    cur_x = None
    cur: List[tuple] = []
    for (x, z, scale) in rot_terms:
        x = int(x)
        if cur and x != cur_x:
            runs.append((cur_x, cur))
            cur = []
        cur_x = x
        cur.append((int(z), float(scale)))
    if cur:
        runs.append((cur_x, cur))
    out = []
    lo_mask = (1 << engine.n_local) - 1
    for x, terms in runs:
        z_lo, z_hi, scales, phre, phim = [], [], [], [], []
        for (z, scale) in terms:
            zb = engine._flat(z)
            z_lo.append(zb & lo_mask)
            z_hi.append(zb >> engine.n_local)
            scales.append(scale)
            ph = (-1j) ** (bin(x & z).count("1") % 4)
            phre.append(ph.real)
            phim.append(ph.imag)
        out.append(
            (
                x,
                np.asarray(z_lo, np.uint32),
                np.asarray(z_hi, np.uint32),
                np.asarray(scales, np.float64),
                np.asarray(phre, np.float64),
                np.asarray(phim, np.float64),
            )
        )
    return out


def _check_mask_widths(engine: ShardedPauliEngine):
    """The scan lowerings ride (local, device) uint32 mask PAIRS, so the
    qubit count is unbounded as long as each half fits 32 bits: a >2^32-
    amplitude local shard (32 GB+ of complex64) or a >2^32-device mesh is
    far beyond any current configuration, but fail loudly rather than
    silently truncate."""
    if engine.n_local > 32:
        raise ValueError(
            f"scan lowering: local shard index space {engine.n_local} bits "
            "exceeds the uint32 local masks (shard over more devices)"
        )
    if engine.k > 32:
        raise ValueError("scan lowering: more than 2^32 devices is unsupported")


def _static_flip(engine: ShardedPauliEngine, psi_l, x_qmask: int):
    """psi[b ^ x] for a STATIC qubit mask: local XOR + static ppermute."""
    xb = engine._flat(x_qmask)
    x_hi, x_lo = _split_mask_flat(xb, engine.n, engine.k)
    from ..engine.gates import _xor_flip

    t = _xor_flip(psi_l, engine.n_local, x_lo)
    return _xor_ppermute(t, x_hi, engine.n_devices)


def _z_signs(engine: ShardedPauliEngine, z_lo, z_hi, rdt):
    """(-1)^{z.b} for a TRACED (local, device) z-mask pair.

    The pair is split on the HOST (pack_generator/pack_observable), so no
    flat mask wider than 32 bits ever exists on device -- the scan
    lowerings scale past 32 total qubits without 64-bit types (which the
    default TPU config would silently truncate)."""
    idx = jax.lax.iota(jnp.uint32, 1 << engine.n_local)
    par_lo = jax.lax.population_count(idx & z_lo.astype(jnp.uint32)) & jnp.uint32(1)
    d = jax.lax.axis_index(AMP_AXIS).astype(jnp.uint32)
    par_hi = jax.lax.population_count(d & z_hi.astype(jnp.uint32)) & jnp.uint32(1)
    par = (par_lo + par_hi) & jnp.uint32(1)
    return 1.0 - 2.0 * par.astype(rdt)


def generator_rotation_scan(engine, psi_l, packed, theta):
    """exp(-i theta G)|psi> as one scan per x-group of the generator."""
    rdt = real_dtype(psi_l.dtype)
    theta = jnp.asarray(theta, dtype=rdt)
    for (x, z_lo, z_hi, scales, phre, phim) in packed:
        def body(psi, term, _x=x):
            zl, zh, scale, pr, pi = term
            t = _static_flip(engine, psi, _x)
            s = _z_signs(engine, zl, zh, rdt)
            ph = (pr + 1j * pi).astype(psi.dtype)
            ppsi = ph * s.astype(psi.dtype) * t
            th = theta * scale.astype(rdt)
            c = jnp.cos(th).astype(psi.dtype)
            sn = jnp.sin(th).astype(psi.dtype)
            return c * psi - 1j * sn * ppsi, None

        xs = (
            jnp.asarray(z_lo),
            jnp.asarray(z_hi),
            jnp.asarray(scales, rdt),
            jnp.asarray(phre, rdt),
            jnp.asarray(phim, rdt),
        )
        psi_l, _ = jax.lax.scan(body, psi_l, xs)
    return psi_l


def generator_rotation_scan_inverse(engine, psi_l, packed, theta):
    """Exact inverse: reversed term order, negated angle."""
    rdt = real_dtype(psi_l.dtype)
    return generator_rotation_scan(
        engine,
        psi_l,
        [
            (x, z_lo[::-1].copy(), z_hi[::-1].copy(), -scales[::-1],
             phre[::-1].copy(), phim[::-1].copy())
            for (x, z_lo, z_hi, scales, phre, phim) in reversed(packed)
        ],
        theta,
    )


def apply_generator_scan(engine, psi_l, packed):
    """G|psi> (the gradient probe) as scans accumulating over terms."""
    rdt = real_dtype(psi_l.dtype)
    out = jnp.zeros_like(psi_l)
    for (x, z_lo, z_hi, scales, phre, phim) in packed:
        flipped = _static_flip(engine, psi_l, x)

        def body(acc, term):
            zl, zh, scale, pr, pi = term
            s = _z_signs(engine, zl, zh, rdt)
            ph = (pr + 1j * pi).astype(acc.dtype)
            return acc + scale.astype(rdt) * ph * s.astype(acc.dtype) * flipped, None

        xs = (
            jnp.asarray(z_lo),
            jnp.asarray(z_hi),
            jnp.asarray(scales, rdt),
            jnp.asarray(phre, rdt),
            jnp.asarray(phim, rdt),
        )
        out, _ = jax.lax.scan(body, out, xs)
    return out


# -- observables ------------------------------------------------------------------


def pack_observable(engine: ShardedPauliEngine, op) -> List[tuple]:
    """Pack a PauliSum for scan-lowered sharded expectation.

    Terms group by the DEVICE part of their flip mask (expectation is a sum,
    so reordering is safe): one static collective permute per group, traced
    local flips inside a scan.  Coefficients carry the (-1)^{|x&z|} sign the
    flips+signs body reconstruction requires (see build_sharded_screen_fn).
    """
    _check_mask_widths(engine)
    lo_mask = (1 << engine.n_local) - 1
    groups = {}
    for x, z, c in zip(op.x, op.z, op.c):
        x, z = int(x), int(z)
        xb = engine._flat(x)
        zb = engine._flat(z)
        x_hi, x_lo = _split_mask_flat(xb, engine.n, engine.k)
        cs = complex(c) * ((-1.0) ** (bin(x & z).count("1") & 1))
        groups.setdefault(x_hi, []).append(
            (x_lo, zb & lo_mask, zb >> engine.n_local, cs.real, cs.imag)
        )
    out = []
    for x_hi, terms in sorted(groups.items()):
        out.append(
            (
                x_hi,
                np.asarray([t[0] for t in terms], np.uint32),
                np.asarray([t[1] for t in terms], np.uint32),
                np.asarray([t[2] for t in terms], np.uint32),
                np.asarray([t[3] for t in terms], np.float64),
                np.asarray([t[4] for t in terms], np.float64),
            )
        )
    return out


def expectation_scan_local(engine: ShardedPauliEngine, psi_l, packed_obs):
    """Local partial of Re<psi|op|psi> over a packed observable; caller or
    this function psums -- returns the ALREADY-psummed replicated scalar."""
    rdt = real_dtype(psi_l.dtype)
    wc = jnp.conj(psi_l)
    total = jnp.zeros((), dtype=rdt)
    for (x_hi, x_lo, z_lo, z_hi, cre, cim) in packed_obs:
        psi_p = _xor_ppermute(psi_l, x_hi, engine.n_devices)

        def body(acc, term, _pp=psi_p):
            xl, zl, zh, cr, ci = term
            t = xor_flip_traced(_pp, engine.n_local, xl)
            s = _z_signs(engine, zl, zh, rdt)
            ov = jnp.sum(wc * (cr + 1j * ci).astype(t.dtype) * s.astype(t.dtype) * t)
            return acc + jnp.real(ov).astype(rdt), None

        xs = (
            jnp.asarray(x_lo),
            jnp.asarray(z_lo),
            jnp.asarray(z_hi),
            jnp.asarray(cre, rdt),
            jnp.asarray(cim, rdt),
        )
        total, _ = jax.lax.scan(body, total, xs)
    return jax.lax.psum(total, AMP_AXIS)


def sharded_metrics_fn(engine: ShardedPauliEngine, sz_op, s2_op, rdt, metrics: bool):
    """Build the (Sz, S^2, fidelity) extras callback shared by the driver
    train steps.  Observables are scan-lowered (pack_observable), so the
    metric block stays O(#cross-shard groups) in program size; fidelity is
    the subspace-projection overlap with the sharded exact states."""
    packed_sz = pack_observable(engine, sz_op) if metrics else None
    packed_s2 = pack_observable(engine, s2_op) if metrics else None

    def extras(psi_l, gs_shards):
        if metrics:
            sz = expectation_scan_local(engine, psi_l, packed_sz)
            s2 = expectation_scan_local(engine, psi_l, packed_s2)
        else:
            sz = jnp.zeros((), rdt)
            s2 = jnp.zeros((), rdt)
        fid = jnp.zeros((), rdt)
        for g in gs_shards:
            gloc = (g[0] + 1j * g[1]).astype(psi_l.dtype)
            ov = jax.lax.psum(jnp.vdot(gloc, psi_l), AMP_AXIS)
            fid = fid + (jnp.abs(ov) ** 2).astype(rdt)
        return sz, s2, fid

    return extras


# -- shared adjoint core -----------------------------------------------------------


def adjoint_energy_grads(
    engine: ShardedPauliEngine,
    slots,
    thetas,
    occupied,
    network,
    net_position: str,
    obs_op,
    n_params: int,
    dtype,
    extras_fn=None,
):
    """Energy + adjoint-replay gradients for a slotted rotation program.

    The ONE implementation of the forward / analytic-cotangent / reverse-
    replay loop shared by every sharded builder (ADAPT applies the Givens
    network AFTER the ansatz, ``net_position='post'``; HVA prepares the
    Slater state with it FIRST, ``'pre'``).  ``slots``: [(packed_generator,
    param_index)] in application order (param indices may repeat across
    slots -- gradients accumulate).  ``extras_fn(psi_local)``: optional
    callback evaluated on the final state (metrics/fidelity); its result is
    returned unchanged as the third element.
    """
    rdt = real_dtype(dtype)
    psi = engine.basis_state_local(occupied, dtype=dtype)
    if net_position == "pre":
        psi = network.apply(psi)
    for packed, k in slots:
        psi = generator_rotation_scan(engine, psi, packed, thetas[k])
    if net_position == "post":
        psi = network.apply(psi)
    hpsi = engine.apply_paulisum_local(psi, obs_op)
    energy = jax.lax.psum(jnp.real(jnp.vdot(psi, hpsi)).astype(rdt), AMP_AXIS)
    extras = extras_fn(psi) if extras_fn is not None else ()
    lam = 2.0 * hpsi
    if net_position == "post":
        psi = network.apply(psi, inverse=True)
        lam = network.apply(lam, inverse=True)
    grads = jnp.zeros(n_params, dtype=rdt)
    eye = np.eye(n_params)
    for packed, k in reversed(slots):
        gpsi = apply_generator_scan(engine, psi, packed)
        g = jax.lax.psum(jnp.imag(jnp.vdot(lam, gpsi)).astype(rdt), AMP_AXIS)
        # scatter-free (TPU backend rejects scatter lowerings)
        grads = grads + g * jnp.asarray(eye[k], rdt)
        psi = generator_rotation_scan_inverse(engine, psi, packed, thetas[k])
        lam = generator_rotation_scan_inverse(engine, lam, packed, thetas[k])
    return energy, grads, extras


# -- Givens network ---------------------------------------------------------------


class ShardedGivensNetwork:
    """The Slater/FT Givens network lowered to ordered segments:

    ("rzlayer", angles) | ("u4scan", fa[], fb[], U[T,4,4,2]) |
    ("u4x", M(4x4 complex), i, j)   [cross-shard, unrolled]
    """

    def __init__(self, engine: ShardedPauliEngine, diagonal, decomposition):
        self.engine = engine
        n, k = engine.n, engine.k
        segments: List[tuple] = []
        angles = tuple(float(np.angle(diagonal[i])) for i in range(n))
        segments.append(("rzlayer", angles))

        buf: List[tuple] = []

        def flush():
            if not buf:
                return
            fa, fb, mats = [], [], []
            for (M, qa, qb) in buf:
                Ma = np.asarray(M, dtype=np.complex128)
                if qa > qb:
                    Ma = Ma.reshape(2, 2, 2, 2).transpose(1, 0, 3, 2).reshape(4, 4)
                    qa, qb = qb, qa
                # local flat bit of qubit q (q >= k): n-1-q < n_local
                fa.append(1 << (n - 1 - qa))
                fb.append(1 << (n - 1 - qb))
                mats.append(np.stack([Ma.real, Ma.imag], axis=-1))
            segments.append(
                (
                    "u4scan",
                    np.asarray(fa, np.uint32),
                    np.asarray(fb, np.uint32),
                    np.asarray(mats, np.float64),
                )
            )
            buf.clear()

        for parallel_ops in reversed(decomposition):
            for op in parallel_ops:
                if op == "pht":
                    q = n - 1
                    M = np.array([[0, 1], [1, 0]], dtype=np.complex128)
                    partner = q - 1
                    lifted = np.kron(np.eye(2), M)  # partner < q
                    self._emit_gate(segments, buf, flush, lifted, partner, q, k)
                else:
                    i, j, theta, phi = op
                    M = givens_plan_matrix(float(theta), float(phi))
                    self._emit_gate(segments, buf, flush, M, i, j, k)
        flush()
        self.segments = segments

    @staticmethod
    def _emit_gate(segments, buf, flush, M, i, j, k):
        if min(i, j) < k:  # touches a sharded qubit
            flush()
            segments.append(("u4x", np.asarray(M, np.complex128), i, j))
        else:
            buf.append((M, i, j))

    def apply(self, psi_l, inverse: bool = False):
        engine = self.engine
        rdt = real_dtype(psi_l.dtype)
        body = _u4_body(engine.n_local, rdt)
        seq = self.segments if not inverse else list(reversed(self.segments))
        for seg in seq:
            kind = seg[0]
            if kind == "rzlayer":
                angles = seg[1] if not inverse else [-a for a in seg[1]]
                psi_l = engine.rz_layer_local(psi_l, angles)
            elif kind == "u4scan":
                fa, fb, U = seg[1], seg[2], seg[3]
                if inverse:
                    # conj transpose each gate, reversed order
                    Uc = U[..., 0] + 1j * U[..., 1]
                    Uc = np.conj(np.transpose(Uc, (0, 2, 1)))[::-1]
                    U = np.stack([Uc.real, Uc.imag], axis=-1)
                    fa, fb = fa[::-1].copy(), fb[::-1].copy()
                xs = (jnp.asarray(fa), jnp.asarray(fb), jnp.asarray(U, rdt))
                psi_l, _ = jax.lax.scan(body, psi_l, xs)
            else:  # u4x
                M, i, j = seg[1], seg[2], seg[3]
                if inverse:
                    M = M.conj().T
                psi_l = engine.apply_two_qubit_local(psi_l, M, i, j)
        return psi_l
