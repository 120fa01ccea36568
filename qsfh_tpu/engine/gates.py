"""Fused statevector gate kernels (single shard).

TPU-first design notes
----------------------
The reference decomposes every exp(-i theta P) into a basis-change +
CNOT-parity-ladder + RZ + uncompute circuit (``PauliStringRotation``,
``/root/reference/models/utils.py:58-83``) -- O(|P|) full-statevector passes
per rotation.  Here each rotation is ONE fused update:

    exp(-i t P)|psi> = cos(t)|psi> - i sin(t) P|psi>

with ``P|psi>`` computed matrix-free: the X part is a single multi-axis
``jnp.reverse`` (all flipped axes reversed in one pass), the Z part is an
elementwise parity sign fused by XLA into the same pass.  Diagonal rotations
(x == 0) collapse to one elementwise complex multiply, letting a whole HVA
Coulomb layer run as a single pass (see :func:`diagonal_rotation`).

All masks/qubit indices are Python ints at trace time, so XLA sees static
shapes and static transposes only.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .state import (
    bitpos,
    const_complex,
    parity_signs,
    qmask_to_bmask,
    real_dtype,
)


def _operand_matrix(U, dtype):
    """Lift a gate matrix into traced code.

    Host (numpy/list) matrices become complex-free-ABI constants
    (const_complex); traced/jax values pass through with a dtype cast.
    """
    if isinstance(U, (np.ndarray, list, tuple)):
        return const_complex(np.asarray(U), dtype)
    return jnp.asarray(U, dtype=dtype)


# -- shape helpers -------------------------------------------------------------


def _flip_shape(n: int, positions) -> tuple:
    """Split shape isolating each flat-bit position as its own size-2 axis.

    positions must be strictly descending flat-bit positions.
    Returns (shape, flip_axes).
    """
    shape = []
    axes = []
    prev = n  # exclusive upper bound of remaining bits
    for p in positions:
        if prev - p - 1 > 0:
            shape.append(1 << (prev - p - 1))
        axes.append(len(shape))
        shape.append(2)
        prev = p
    if prev > 0:
        shape.append(1 << prev)
    return tuple(shape), tuple(axes)


_LANE = 128
_LANE_BITS = 7


@lru_cache(maxsize=512)
def _lane_perm_matrix(lane_mask: int) -> np.ndarray:
    """Static 0/1 permutation matrix P[i, j] = [i ^ j == lane_mask]."""
    ii = np.arange(_LANE)[:, None]
    jj = np.arange(_LANE)[None, :]
    return ((ii ^ jj) == lane_mask).astype(np.float64)


def _xor_flip(psi: jnp.ndarray, n: int, bmask: int) -> jnp.ndarray:
    """t[b] = psi[b ^ bmask], TPU-layout-aware.

    TPU tiles pad an array's last two dims to (8, 128); multi-axis
    reverses over per-bit reshapes create tiny trailing dims and inflate
    memory traffic up to 128x.  Instead the state is viewed as
    (rows, 128): the low 7 mask bits apply as one constant permutation
    matmul over the full lane axis, the row bits as axis reversals whose
    trailing dims stay (2, B*128).
    """
    if bmask == 0:
        return psi
    if n < _LANE_BITS or jax.default_backend() == "cpu":
        # CPU has no tile padding -- the direct multi-axis reverse is fastest
        positions = [p for p in range(n - 1, -1, -1) if (bmask >> p) & 1]
        shape, axes = _flip_shape(n, positions)
        return jnp.flip(psi.reshape(shape), axis=axes).reshape(psi.shape)

    rows = (1 << n) // _LANE
    a2 = psi.reshape(rows, _LANE)
    lane_mask = bmask & (_LANE - 1)
    if lane_mask:
        # real-plane matmuls: complex matmul is not universally lowered on
        # TPU backends; P is a real 0/1 permutation
        P = jnp.asarray(_lane_perm_matrix(lane_mask), dtype=real_dtype(psi.dtype))
        a2 = (jnp.real(a2) @ P + 1j * (jnp.imag(a2) @ P)).astype(psi.dtype)
    row_mask = bmask >> _LANE_BITS
    for p in range(max(n - _LANE_BITS, 0)):
        if (row_mask >> p) & 1:
            A = rows >> (p + 1)
            a2 = jnp.flip(a2.reshape(A, 2, (1 << p) * _LANE), axis=1).reshape(
                rows, _LANE
            )
    return a2.reshape(psi.shape)


# -- packed Pauli application ----------------------------------------------------


def apply_pauli_string(psi: jnp.ndarray, n: int, x: int, z: int) -> jnp.ndarray:
    """Apply the Hermitian Pauli string P = i^{|x&z|} X^x Z^z (unit coefficient).

    x, z are qubit-indexed masks (bit q = qubit q), static Python ints.
    """
    rdt = real_dtype(psi.dtype)
    xb = qmask_to_bmask(x, n)
    zb = qmask_to_bmask(z, n)
    t = _xor_flip(psi, n, xb)
    if zb:
        t = t * parity_signs(n, zb, rdt)
    # global phase: i^{|x&z|} from the string convention times
    # (-1)^{|x&z|} from commuting Z^z past the flip => (-i)^{|x&z|}
    k = bin(x & z).count("1") % 4
    phase = (-1j) ** k
    if phase != 1:
        t = t * const_complex(phase, psi.dtype)
    return t


def pauli_rotation(psi: jnp.ndarray, n: int, x: int, z: int, theta) -> jnp.ndarray:
    """exp(-i theta P) |psi> for the Hermitian string P = i^{|x&z|} X^x Z^z.

    For diagonal strings (x == 0) this is one fused elementwise pass.
    """
    rdt = real_dtype(psi.dtype)
    theta = jnp.asarray(theta, dtype=rdt)
    if x == 0:
        zb = qmask_to_bmask(z, n)
        s = parity_signs(n, zb, rdt) if zb else jnp.ones((), rdt)
        # exp(-i theta s) with s = +-1: cos(theta) - i s sin(theta)
        return psi * (jnp.cos(theta) - 1j * s * jnp.sin(theta)).astype(psi.dtype)
    ppsi = apply_pauli_string(psi, n, x, z)
    c = jnp.cos(theta).astype(psi.dtype)
    s = jnp.sin(theta).astype(psi.dtype)
    return c * psi - 1j * s * ppsi


def diagonal_rotation(psi: jnp.ndarray, diag: jnp.ndarray, theta) -> jnp.ndarray:
    """exp(-i theta D)|psi> for a precomputed real diagonal vector D.

    Used to fuse a whole commuting diagonal generator (e.g. the HVA Coulomb
    layer, every term of JW(U n_up n_down) being Z-type) into ONE pass,
    replacing |terms| sequential PauliStringRotations in the reference
    (``/root/reference/models/hva.py:293``).
    """
    rdt = real_dtype(psi.dtype)
    theta = jnp.asarray(theta, dtype=rdt)
    return psi * jnp.exp(-1j * theta * diag.astype(rdt)).astype(psi.dtype)


def generator_rotation(psi: jnp.ndarray, n: int, rot_terms, theta) -> jnp.ndarray:
    """First-order-Trotter exp(-i theta G): one fused rotation per Pauli term.

    rot_terms: list of (x, z, scale) from PauliSum.rotation_terms().
    Mirrors Trotterize_generator (/root/reference/models/hva.py:84-95); for
    the generators used by HVA/ADAPT the terms mutually commute, so this is
    exact, not a Trotter approximation.
    """
    for (x, z, scale) in rot_terms:
        psi = pauli_rotation(psi, n, x, z, theta * scale)
    return psi


# -- dense few-qubit gates --------------------------------------------------------


def apply_one_qubit(psi: jnp.ndarray, n: int, U2, q: int) -> jnp.ndarray:
    p = bitpos(q, n)
    A, C = 1 << (n - 1 - p), 1 << p
    U = _operand_matrix(U2, psi.dtype)
    t = psi.reshape(A, 2, C)
    out = jnp.einsum("xi,aic->axc", U, t)
    return out.reshape(psi.shape)


def apply_two_qubit(psi: jnp.ndarray, n: int, U4, qa: int, qb: int) -> jnp.ndarray:
    """Apply a 4x4 unitary; U4 is indexed row-major by the basis |qa qb>."""
    if qa == qb:
        raise ValueError("two-qubit gate needs distinct qubits")
    U = _operand_matrix(U4, psi.dtype).reshape(2, 2, 2, 2)
    if qa > qb:
        # swap which tensor factor each axis refers to
        U = jnp.transpose(U, (1, 0, 3, 2))
        qa, qb = qb, qa
    pa, pb = bitpos(qa, n), bitpos(qb, n)  # pa > pb
    A = 1 << (n - 1 - pa)
    B = 1 << (pa - pb - 1)
    C = 1 << pb
    t = psi.reshape(A, 2, B, 2, C)
    out = jnp.einsum("xyij,aibjc->axbyc", U, t)
    return out.reshape(psi.shape)


def pauli_x(psi: jnp.ndarray, n: int, q: int) -> jnp.ndarray:
    return _xor_flip(psi, n, 1 << bitpos(q, n))


def rz(psi: jnp.ndarray, n: int, phi, q: int) -> jnp.ndarray:
    """PennyLane RZ convention: diag(e^{-i phi/2}, e^{+i phi/2})."""
    rdt = real_dtype(psi.dtype)
    phi = jnp.asarray(phi, dtype=rdt)
    s = parity_signs(n, qmask_to_bmask(1 << q, n), rdt)
    return psi * jnp.exp(-1j * (phi / 2) * s).astype(psi.dtype)


def ry_matrix(theta, dtype=np.complex128):
    c, s = np.cos(theta / 2), np.sin(theta / 2)
    return np.array([[c, -s], [s, c]], dtype=dtype)


def rx_matrix(theta, dtype=np.complex128):
    c, s = np.cos(theta / 2), np.sin(theta / 2)
    return np.array([[c, -1j * s], [-1j * s, c]], dtype=dtype)


def ry(psi, n, theta, q):
    """exp(-i theta Y_q / 2) (traced-parameter version)."""
    return pauli_rotation(psi, n, 1 << q, 1 << q, jnp.asarray(theta) / 2)


def rx(psi, n, theta, q):
    return pauli_rotation(psi, n, 1 << q, 0, jnp.asarray(theta) / 2)


def cnot(psi: jnp.ndarray, n: int, control: int, target: int) -> jnp.ndarray:
    U = np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=np.complex128
    )
    return apply_two_qubit(psi, n, U, control, target)


def givens_plan_matrix(theta: float, phi: float) -> np.ndarray:
    """Constant 4x4 for one Givens-plan op: RZ(phi) on wire j AFTER
    SingleExcitation(2*theta) on wires (i, j).

    The plan angles are static floats, so fusing the two gates into one
    host-built matrix halves the gate count of the FT network -- which
    dominates compile time at 18 qubits (the axon compiler costs ~7ms per
    HLO equation).
    """
    c, s = np.cos(theta), np.sin(theta)
    se = np.array(
        [[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]],
        dtype=np.complex128,
    )
    rzj = np.diag(
        np.exp(np.array([-1j, 1j, -1j, 1j]) * (phi / 2))
    )
    return rzj @ se


def static_rz_layer_phases(angles, n: int) -> np.ndarray:
    """Host-precomputed phase vector for a whole layer of static RZ gates.

    phase[b] = prod_i exp(-i angles[i]/2 * s_i(b)),  s_i = +-1 by bit i.
    Replaces n sequential rz passes with ONE elementwise multiply.
    """
    total = np.zeros(1 << n, dtype=np.float64)
    idx = np.arange(1 << n, dtype=np.uint64)
    for q in range(n):
        if angles[q] == 0.0:
            continue
        bit = (idx >> np.uint64(n - 1 - q)) & np.uint64(1)
        total += angles[q] / 2 * (1.0 - 2.0 * bit.astype(np.float64))
    return np.exp(-1j * total)


def single_excitation(psi: jnp.ndarray, n: int, phi, qa: int, qb: int) -> jnp.ndarray:
    """PennyLane SingleExcitation(phi) on wires [qa, qb].

    Rotates in the {|01>, |10>} subspace:
        |01> -> cos(phi/2)|01> + sin(phi/2)|10>   (column convention below)
    Generator: exp(-i phi/2 (Y_a X_b - X_a Y_b)/2); matches PennyLane's
    matrix [[1,0,0,0],[0,c,-s,0],[0,s,c,0],[0,0,0,1]].
    """
    rdt = real_dtype(psi.dtype)
    phi = jnp.asarray(phi, dtype=rdt)
    c = jnp.cos(phi / 2).astype(psi.dtype)
    s = jnp.sin(phi / 2).astype(psi.dtype)
    one = jnp.ones((), psi.dtype)
    zero = jnp.zeros((), psi.dtype)
    U = jnp.stack(
        [
            jnp.stack([one, zero, zero, zero]),
            jnp.stack([zero, c, -s, zero]),
            jnp.stack([zero, s, c, zero]),
            jnp.stack([zero, zero, zero, one]),
        ]
    )
    return apply_two_qubit(psi, n, U, qa, qb)
