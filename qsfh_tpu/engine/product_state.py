"""Phased product states with closed-form Pauli expectations.

Purpose: validate very large statevector kernels (26-30 qubits) on real
hardware *without* a host reference simulation and *without* shipping the
state through the host<->device tunnel.  A product state

    |psi> = prod_q  cos(theta_q/2)|0> + e^{i alpha_q} sin(theta_q/2)|1>

has a per-qubit closed-form expectation for every packed Pauli term, so
the exact <psi|H|psi> of a full Hubbard Hamiltonian is computable on the
host in O(terms * n) float64 arithmetic at ANY qubit count, while the
2^n-amplitude state itself is built on the device from pure elementwise
ops (iota bit tests + exp/cos/sin) that XLA fuses into the consumer.

Engine convention (engine/expectation.py:173-189, "_scan_terms"): a packed
term (x, z, c) acts as  c_adj * D_z X_x  with c_adj = c * (-1)^{|z & x|},
(X_x psi)(k) = psi(k XOR x), (D_z psi)(k) = (-1)^{parity(z & k)} psi(k),
and qubit q occupies flat-index bit (n-1-q) (state.py:22 qmask_to_bmask).
<psi| D_z X_x |psi> factorizes per qubit:

    (x_q, z_q) = (0,0) -> 1
    (0,1) -> cos(theta_q)
    (1,0) -> sin(theta_q) cos(alpha_q)
    (1,1) -> i sin(theta_q) sin(alpha_q)

The reference has no analog of this module; it exists because the rebuild
pushes single-chip evaluation past the scale where reference traces are
computable (reference ceiling: /root/reference/models/adapt_vqe.py:299-304).
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

LANE = 128
LANE_BITS = 7


def product_planes_fn(n: int, thetas, alphas):
    """Return a zero-argument traceable fn building (re, im) f32 planes.

    The planes are shaped (2^n / 128, 128) in the engine's flat-index
    layout.  All per-qubit weights are folded in as Python-float constants
    (no device arrays are indexed: constant-index gathers are rejected by
    some tunneled TPU backends, and value-dependent program hashes give
    every angle draw a fresh compile-cache entry).  log-magnitudes are
    accumulated instead of amplitude products so 30-qubit amplitudes
    (~2^-15 each) stay far from the f32 denormal floor.
    """
    if n < LANE_BITS:
        raise ValueError("product_planes_fn needs at least 7 qubits")
    th = np.asarray(thetas, np.float64)
    al = np.asarray(alphas, np.float64)
    if th.shape != (n,) or al.shape != (n,):
        raise ValueError("thetas/alphas must have shape (n,)")
    # log-weights may be -inf for pinned qubits (theta = 0 or pi); the
    # per-bit jnp.where below keeps them NaN-free (a multiplicative
    # bit*delta form would hit 0 * -inf)
    with np.errstate(divide="ignore"):
        ln_a = np.log(np.abs(np.cos(th / 2.0)))
        ln_b = np.log(np.abs(np.sin(th / 2.0)))
    # cos(th/2) < 0 (th outside [-pi, pi]) flips the |0> amplitude sign;
    # fold signs into the phase as 0-or-pi additions
    ph_a = np.where(np.cos(th / 2.0) < 0, np.pi, 0.0)
    ph_b = al + np.where(np.sin(th / 2.0) < 0, np.pi, 0.0)
    rows = (1 << n) // LANE

    def build():
        rowv = lax.broadcasted_iota(jnp.int32, (rows, LANE), 0)
        lanev = lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
        lnmag = jnp.zeros((rows, LANE), jnp.float32)
        phase = jnp.zeros((rows, LANE), jnp.float32)
        for q in range(n):
            p = n - 1 - q  # flat-index bit of qubit q
            if p < LANE_BITS:
                bit = (lanev >> np.int32(p)) & np.int32(1)
            else:
                bit = (rowv >> np.int32(p - LANE_BITS)) & np.int32(1)
            one = bit == np.int32(1)
            lnmag = lnmag + jnp.where(one, np.float32(ln_b[q]), np.float32(ln_a[q]))
            phase = phase + jnp.where(one, np.float32(ph_b[q]), np.float32(ph_a[q]))
        mag = jnp.exp(lnmag)
        return mag * jnp.cos(phase), mag * jnp.sin(phase)

    return build


def product_state_host(n: int, thetas, alphas) -> np.ndarray:
    """Dense complex128 product state on the host (test-scale n only)."""
    th = np.asarray(thetas, np.float64)
    al = np.asarray(alphas, np.float64)
    psi = np.ones(1, np.complex128)
    for q in range(n):  # qubit 0 is the most significant flat-index bit
        v = np.array(
            [math.cos(th[q] / 2.0),
             math.sin(th[q] / 2.0) * complex(math.cos(al[q]), math.sin(al[q]))],
            np.complex128,
        )
        psi = np.kron(psi, v)
    return psi


def hermitian_string(x: int, z: int):
    """The Hermitian Pauli string P = i^{|x&z|} X^x Z^z as a PauliSum.

    Matches engine/gates.py:144 pauli_rotation's convention; P^2 = I for
    any masks, so exp(-i theta P) = cos(theta) - i sin(theta) P.
    """
    from ..ops.pauli import PauliSum

    w = bin(x & z).count("1") % 4
    return PauliSum([x], [z], [1j**w])


def stream_rotation_inputs(n: int, rotations):
    """Host inputs for rotation_stream_planes from (x, z, theta) triples.

    Returns (xb, zb, thetas, phre, phim): flat-index bitmasks plus the
    kernel phase ph = (-i)^{|x&z|} such that P = ph * D_z X_x equals
    hermitian_string(x, z) in the engine's operator order.
    """
    from .state import qmask_to_bmask

    xb, zb, th, phre, phim = [], [], [], [], []
    for x, z, theta in rotations:
        w = bin(x & z).count("1") % 4
        ph = (-1j) ** w
        xb.append(qmask_to_bmask(int(x), n))
        zb.append(qmask_to_bmask(int(z), n))
        th.append(float(theta))
        phre.append(ph.real)
        phim.append(ph.imag)
    return (
        np.asarray(xb, np.uint32),
        np.asarray(zb, np.uint32),
        np.asarray(th, np.float32),
        np.asarray(phre, np.float32),
        np.asarray(phim, np.float32),
    )


def rotated_hamiltonian(op, rotations):
    """U^dag H U for U = exp(-i th_T P_T) ... exp(-i th_0 P_0), computed
    symbolically (ops/dressing.py): each P_t = hermitian_string(x_t, z_t).

    <psi| U^dag H U |psi> equals the energy of the rotated state, so a
    closed-form product-state expectation of the dressed operator
    validates the on-device rotation kernels at any qubit count.
    """
    from ..ops.dressing import dress_once

    out = op
    for x, z, theta in reversed(list(rotations)):
        out = dress_once(out, hermitian_string(int(x), int(z)), 2.0 * float(theta))
    return out


def _qubit_amps(thetas, alphas):
    th = np.asarray(thetas, np.float64)
    al = np.asarray(alphas, np.float64)
    a = np.cos(th / 2.0).astype(np.complex128)
    b = np.sin(th / 2.0) * np.exp(1j * al)
    return a, b


def product_pair_term_values(op, n: int, w_angles, psi_angles) -> np.ndarray:
    """Per-term complex values  c_adj,t * <w| D_z X_x |psi>  (host float64).

    For two (possibly different) product states the matrix element also
    factorizes per qubit:

        M_q = conj(aw)*a + (-1)^{z_q} conj(bw)*b        if x_q = 0
        M_q = conj(aw)*b + (-1)^{z_q} conj(bw)*a        if x_q = 1

    The engine consumes these as: expectation = Re(sum_t V_t) when w=psi;
    screening contribution_t = 2 Im(V_t) with w the cotangent state
    (pallas_kernels._screen_stream_kernel's 2(cre*vi + cim*vr)).
    """
    aw, bw = _qubit_amps(*w_angles)
    a, b = _qubit_amps(*psi_angles)
    caw, cbw = np.conj(aw), np.conj(bw)
    m_x0 = np.stack([caw * a + cbw * b, caw * a - cbw * b])   # [z_q][q]
    m_x1 = np.stack([caw * b + cbw * a, caw * b - cbw * a])
    vals = np.empty(len(op.c), np.complex128)
    for t, (x, z, c) in enumerate(zip(op.x, op.z, op.c)):
        x, z = int(x), int(z)
        m = complex(c) * ((-1.0) ** bin(z & x).count("1"))
        for q in range(n):  # identity qubits contribute <w_q|psi_q>, not 1
            xq = (x >> q) & 1
            zq = (z >> q) & 1
            m *= m_x1[zq, q] if xq else m_x0[zq, q]
            if m == 0:
                break
        vals[t] = m
    return vals


def product_expectation(op, n: int, thetas, alphas) -> float:
    """Closed-form Re <psi| op |psi> for a packed PauliSum, host float64."""
    ang = (thetas, alphas)
    return float(product_pair_term_values(op, n, ang, ang).sum().real)
