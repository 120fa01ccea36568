"""Shot-based measurement: bitstring sampling and grouped Pauli estimation.

The reference runs analytic statevector expectations only (PennyLane
``default.qubit`` ``qml.expval``, consumed throughout
``/root/reference/models/adapt_vqe.py``); PennyLane users nevertheless get
the shot-based workflow (``shots=``, ``qml.sample``) from the same device.
This module supplies that workflow natively so estimator studies and
hardware-realistic noise floors can be run against any trained state:

* ``qwc_groups`` — greedy qubit-wise-commuting grouping of a ``PauliSum``
  (each group is measurable in one shared per-qubit basis setting),
* ``sample_bitstrings`` / ``sample_counts`` — device-side categorical
  sampling from ``|psi|^2``,
* ``estimate_expectation`` — the full pipeline: rotate into each group's
  measurement basis, sample, and average signed eigenvalues, with the
  shot-noise standard error propagated per group.

TPU-first design: the basis change is a chain of 2x2 matmuls XLA fuses into
one program, sampling is a single ``jax.random.categorical`` over the 2^n
probability vector (no host round-trip per shot), and the per-term signs
for all shots are one fused ``population_count`` broadcast over a
``(shots, terms)`` uint32 grid — elementwise VPU work, no gather/scatter.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .state import const_complex, qmask_to_bmask, real_dtype
from .gates import apply_one_qubit
from ..ops.pauli import PauliSum, _popcount

_SQRT2 = np.sqrt(2.0)
# R X R^dag = Z  (Hadamard)
_ROT_X = np.array([[1.0, 1.0], [1.0, -1.0]], dtype=np.complex128) / _SQRT2
# R Y R^dag = Z  (Hadamard after S^dag)
_ROT_Y = np.array([[1.0, -1.0j], [1.0, 1.0j]], dtype=np.complex128) / _SQRT2


def string_support(op: PauliSum):
    """Per-term (X-basis, Y-basis, Z-basis) qubit masks of the *string* form.

    The packed monomial is ``c * X^x Z^z``; per qubit, ``x&~z`` measures X,
    ``x&z`` measures Y, ``~x&z`` measures Z.
    """
    x, z = op.x, op.z
    return x & ~z, x & z, ~x & z


def qwc_groups(op: PauliSum) -> List[np.ndarray]:
    """Greedily partition terms into qubit-wise-commuting groups.

    Two strings qubit-wise commute iff on every qubit where both act they
    use the same Pauli.  Each group carries a joint basis signature
    ``(xb, yb, zb)`` (qubits measured in X / Y / Z); a term joins the first
    group whose signature it does not conflict with, so the per-candidate
    test is O(1) in group size and the grouping is equivalent to pairwise
    QWC.  Terms are offered largest-support-first, which empirically keeps
    the group count near the graph-coloring result for Hubbard/molecular
    Hamiltonians.  Returns index arrays into ``op``'s term order.
    """
    xm, ym, zm = string_support(op)
    support = xm | ym | zm
    order = np.argsort(-_popcount(support), kind="stable")
    sigs: List[List[np.uint64]] = []  # [xb, yb, zb] per group
    members: List[List[int]] = []
    for idx in order:
        i = int(idx)
        tx, ty, tz = xm[i], ym[i], zm[i]
        placed = False
        for sig, mem in zip(sigs, members):
            conflict = (
                (tx & (sig[1] | sig[2]))
                | (ty & (sig[0] | sig[2]))
                | (tz & (sig[0] | sig[1]))
            )
            if not conflict:
                sig[0] |= tx
                sig[1] |= ty
                sig[2] |= tz
                mem.append(i)
                placed = True
                break
        if not placed:
            sigs.append([tx, ty, tz])
            members.append([i])
    return [np.array(m, dtype=np.int64) for m in members]


def rotate_to_group_basis(
    psi: jnp.ndarray, n: int, x_basis_mask: int, y_basis_mask: int
) -> jnp.ndarray:
    """Apply the per-qubit basis change so the group is diagonal in Z.

    Qubits in ``x_basis_mask`` get H; in ``y_basis_mask`` get H S^dag.  The
    loop unrolls at trace time into a chain of (A,2,C) matmuls XLA fuses.
    """
    for q in range(n):
        bit = 1 << q
        if x_basis_mask & bit:
            psi = apply_one_qubit(psi, n, _ROT_X, q)
        elif y_basis_mask & bit:
            psi = apply_one_qubit(psi, n, _ROT_Y, q)
    return psi


_SAMPLE_CHUNK = 256


def sample_bitstrings(
    psi: jnp.ndarray, n: int, shots: int, key: jax.Array
) -> jnp.ndarray:
    """Sample ``shots`` flat basis indices from ``|psi|^2`` (uint32).

    Inverse-CDF counting: one cumulative sum over the 2^n probability
    vector, ``shots`` uniform draws, and each index is the count of CDF
    entries strictly below its draw (ties land on the first live entry, so
    zero-probability states are never selected).  The count is a fused
    compare-and-reduce streamed over the CDF in shot chunks — O(2^n +
    shots * 2^n) VPU work with O(shots) random bits.  The previous
    ``jax.random.categorical`` form drew a (shots, 2^n) Gumbel tensor:
    537M threefry outputs at 18 qubits / 2048 shots, the dominant cost of
    the on-chip grouped estimator (benchmarks/tpu_sampling.json round-2:
    18.3 s marginal).  The state never leaves the device and there is no
    per-shot dispatch.
    """
    if n > 30:
        raise ValueError("bitstring sampling limited to 30 qubits per shard")
    p = jnp.real(psi) ** 2 + jnp.imag(psi) ** 2
    cdf = jnp.cumsum(p.reshape(-1))
    total = cdf[-1]
    pad = (-shots) % _SAMPLE_CHUNK
    u = jax.random.uniform(key, (shots + pad,), dtype=cdf.dtype) * total

    def body(_, uc):
        cnt = jnp.sum((cdf[None, :] < uc[:, None]).astype(jnp.int32), axis=1)
        return None, cnt

    _, idx = jax.lax.scan(body, None, u.reshape(-1, _SAMPLE_CHUNK))
    idx = idx.reshape(-1)[:shots]
    return jnp.minimum(idx, (1 << n) - 1).astype(jnp.uint32)


def sample_counts(
    psi: jnp.ndarray, n: int, shots: int, key: jax.Array
) -> Dict[str, int]:
    """Histogram of sampled bitstrings, keyed ``'q0 q1 ... q{n-1}'`` order.

    The flat index packs qubit 0 as the most significant bit (state.py:17),
    so the key string reads left-to-right as qubit 0..n-1 — the same order
    PennyLane's ``qml.counts`` uses for wires 0..n-1.
    """
    samples = np.asarray(sample_bitstrings(psi, n, shots, key))
    idx, cnt = np.unique(samples, return_counts=True)
    return {format(int(i), f"0{n}b"): int(c) for i, c in zip(idx, cnt)}


@dataclass
class MeasurementResult:
    """Shot-estimated expectation with its standard error.

    ``n_groups`` counts the MEASURED groups (groups containing only
    identity terms are folded into the exact constant and dropped), so it
    always equals ``len(group_means)`` / ``len(group_stderrs)``.
    """

    mean: float
    stderr: float
    shots_per_group: int
    n_groups: int
    group_means: np.ndarray
    group_stderrs: np.ndarray


def _group_estimate(
    psi: jnp.ndarray,
    n: int,
    bmasks: np.ndarray,
    coeffs: np.ndarray,
    x_basis: int,
    y_basis: int,
    shots: int,
    key: jax.Array,
):
    """Rotate, sample, and average one QWC group; returns (mean, var-of-mean)."""

    rot = rotate_to_group_basis(psi, n, x_basis, y_basis)
    samples = sample_bitstrings(rot, n, shots, key)  # (shots,)
    masks = jnp.asarray(bmasks, dtype=jnp.uint32)  # (T,)
    par = jax.lax.population_count(samples[:, None] & masks[None, :]) & jnp.uint32(1)
    signs = 1.0 - 2.0 * par.astype(jnp.float64 if psi.dtype == jnp.complex128 else jnp.float32)
    c = jnp.asarray(coeffs, dtype=signs.dtype)
    per_shot = signs @ c  # (shots,) group energy per shot
    mean = jnp.mean(per_shot)
    var = jnp.var(per_shot, ddof=1) / shots if shots > 1 else jnp.zeros_like(mean)
    return mean, var


def _split_identity(op: PauliSum, groups, n: int):
    """Host-side packing shared by both estimators: the exact identity
    contribution and, per group, live-term flat bitmasks + real string
    coefficients + the group's X/Y basis masks."""
    xm, ym, zm = string_support(op)
    support = xm | ym | zm
    if not op.is_hermitian(tol=1e-9):
        raise ValueError("shot estimation requires a Hermitian PauliSum")
    c_str = op.string_coeffs().real
    const = float(c_str[support == 0].sum())
    packed = []
    for idx in groups:
        live = idx[support[idx] != 0]
        if live.size == 0:
            continue
        bmasks = np.array(
            [qmask_to_bmask(int(m), n) for m in support[live]], dtype=np.uint32
        )
        packed.append(
            (
                bmasks,
                c_str[live],
                int(np.bitwise_or.reduce(xm[live])),
                int(np.bitwise_or.reduce(ym[live])),
            )
        )
    return const, packed


def _rotate_data_driven(psi, n: int, x_bits, y_bits):
    """Basis change with TRACED per-qubit selections among {I, H, H S^dag}.

    ``x_bits``/``y_bits`` are (n,) 0/1 real vectors; each qubit's 2x2 is a
    convex selection of the three candidates, so ONE compiled program
    serves every group's basis setting (the masks ride as data, exactly
    like the scan-lowered expectation paths ride packed term data).

    Each qubit applies as an XOR-flip butterfly -- ``psi' = diag(b) psi +
    off(b) psi[k ^ bit]`` with the matrix entries selected per amplitude
    by the bit's parity sign -- instead of the (A, 2, C) reshaped matmul
    of ``apply_one_qubit``: high qubits make that form's trailing dim tiny
    and TPU tiling pads it up to 128x (the dominant cost of the round-2
    on-chip grouped estimator), while ``_xor_flip`` stays lane-shaped.
    """
    from .state import parity_signs

    rdt = real_dtype(psi.dtype)
    eye = const_complex(np.eye(2), psi.dtype)
    rx = const_complex(_ROT_X, psi.dtype)
    ry = const_complex(_ROT_Y, psi.dtype)
    from .gates import _xor_flip

    for q in range(n):
        x = x_bits[q].astype(rdt)
        y = y_bits[q].astype(rdt)
        u = eye * (1.0 - x - y) + rx * x + ry * y
        bmask = 1 << (n - 1 - q)
        t = _xor_flip(psi, n, bmask)
        s = parity_signs(n, bmask, rdt).astype(psi.dtype)  # +1 where bit = 0
        diag = 0.5 * ((u[0, 0] + u[1, 1]) + s * (u[0, 0] - u[1, 1]))
        off = 0.5 * ((u[0, 1] + u[1, 0]) + s * (u[0, 1] - u[1, 0]))
        psi = diag * psi + off * t
    return psi


def pack_groups(op: PauliSum, n: int, groups: Sequence[np.ndarray]):
    """Rectangular host packing of QWC groups for the scan lowering.

    Returns ``(const, masks, coeffs, x_bits, y_bits)``: the exact identity
    contribution, ``(G, T_max)`` flat bitmasks / real string coefficients
    (zero-padded — padded terms contribute sign*0), and ``(G, n)`` 0/1
    per-qubit X/Y basis selectors.
    """
    const, packed = _split_identity(op, groups, n)
    g = len(packed)
    t_max = max((len(b) for b, *_ in packed), default=0)
    masks = np.zeros((g, t_max), dtype=np.uint32)
    coeffs = np.zeros((g, t_max), dtype=np.float64)
    x_bits = np.zeros((g, n), dtype=np.float64)
    y_bits = np.zeros((g, n), dtype=np.float64)
    for i, (b, c, xb, yb) in enumerate(packed):
        masks[i, : len(b)] = b
        coeffs[i, : len(b)] = c
        x_bits[i] = [(xb >> q) & 1 for q in range(n)]
        y_bits[i] = [(yb >> q) & 1 for q in range(n)]
    return const, masks, coeffs, x_bits, y_bits


def estimate_expectation_scan(
    psi: jnp.ndarray,
    n: int,
    op: PauliSum,
    shots: int,
    key: jax.Array,
    groups: Optional[Sequence[np.ndarray]] = None,
) -> MeasurementResult:
    """Scan-lowered grouped estimator: ONE jitted ``lax.scan`` over the QWC
    groups (terms padded to the widest group with zero coefficients), so
    the program size is independent of the group count — the TPU form of
    :func:`estimate_expectation` (whose host loop dispatches one program
    per group).  Same protocol: ``shots`` fresh samples per group.
    """
    if groups is None:
        groups = qwc_groups(op)
    const, masks, coeffs, x_bits, y_bits = pack_groups(op, n, groups)
    rdt = real_dtype(psi.dtype)
    if masks.shape[0] == 0:
        return MeasurementResult(const, 0.0, shots, 0, np.zeros(0), np.zeros(0))
    keys = jax.random.split(key, masks.shape[0])

    def body(_, xs):
        k, m, c, xb, yb = xs
        rot = _rotate_data_driven(psi, n, xb, yb)
        samples = sample_bitstrings(rot, n, shots, k)
        par = jax.lax.population_count(samples[:, None] & m[None, :]) & jnp.uint32(1)
        signs = 1.0 - 2.0 * par.astype(rdt)
        per_shot = signs @ c
        mean = jnp.mean(per_shot)
        var = jnp.var(per_shot, ddof=1) / shots if shots > 1 else jnp.zeros_like(mean)
        return None, (mean, var)

    xs = (
        keys,
        jnp.asarray(masks),
        jnp.asarray(coeffs, dtype=rdt),
        jnp.asarray(x_bits, dtype=rdt),
        jnp.asarray(y_bits, dtype=rdt),
    )
    _, (means, variances) = jax.lax.scan(body, None, xs)
    g_means = np.asarray(means, dtype=np.float64)
    g_vars = np.asarray(variances, dtype=np.float64)
    return MeasurementResult(
        mean=const + float(g_means.sum()),
        stderr=float(np.sqrt(g_vars.sum())),
        shots_per_group=shots,
        n_groups=int(masks.shape[0]),
        group_means=g_means,
        group_stderrs=np.sqrt(g_vars),
    )


def estimate_expectation(
    psi: jnp.ndarray,
    n: int,
    op: PauliSum,
    shots: int,
    key: jax.Array,
    groups: Optional[Sequence[np.ndarray]] = None,
) -> MeasurementResult:
    """Shot-based estimate of ``<psi|op|psi>`` via QWC grouped measurement.

    Each group gets ``shots`` fresh samples in its own basis setting (the
    hardware-realistic protocol: one circuit configuration per group).  The
    identity component is added exactly with zero variance.  ``op`` must be
    Hermitian (real string coefficients).
    """
    if groups is None:
        groups = qwc_groups(op)
    const, packed = _split_identity(op, groups, n)
    g_means, g_vars = [], []
    keys = jax.random.split(key, max(len(packed), 1))
    for gi, (bmasks, cs, x_basis, y_basis) in enumerate(packed):
        mean, var = _group_estimate(
            psi, n, bmasks, cs, x_basis, y_basis, shots, keys[gi]
        )
        g_means.append(float(mean))
        g_vars.append(float(var))

    mean = const + float(np.sum(g_means))
    stderr = float(np.sqrt(np.sum(g_vars)))
    return MeasurementResult(
        mean=mean,
        stderr=stderr,
        shots_per_group=shots,
        n_groups=len(packed),
        group_means=np.asarray(g_means),
        group_stderrs=np.sqrt(np.asarray(g_vars)),
    )
