"""Pauli-sum expectation values, operator application, and pool screening.

TPU-first redesign of the reference's measurement path:

* ``<psi|H|psi>`` is computed matrix-free from the packed (x, z, c) arrays --
  no qml.Hamiltonian object, no gate decomposition.  Terms are grouped by
  their flip mask ``x`` on the host, so each distinct x costs ONE multi-axis
  reverse; all z-sign bookkeeping fuses into elementwise passes.
* Large Pauli sums (the iQCC dressed Hamiltonians, which grow
  multiplicatively per epoch -- ``/root/reference/models/iqcc.py:175-180``)
  use a traced (vmapped) z/c path per x-group, so compile time stays flat in
  the number of terms.
* ADAPT pool screening: the reference appends the ENTIRE pool to the circuit
  and backprops once (``/root/reference/models/adapt_vqe.py:336-341``).
  At zero insertion angle that gradient is exactly the commutator expectation
  ``dE/de_k = 2 Im <w | G_k psi>`` with ``w = U^dag H U psi``, so we compute
  it directly as a batched matrix-free pass over the packed pool -- no giant
  eval circuit, no autodiff.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pauli import PauliSum
from .gates import _xor_flip
from .state import (
    canonical_dtype,
    const_complex,
    index_bits,
    parity_signs,
    qmask_to_bmask,
    real_dtype,
)

# threshold above which an x-group switches from unrolled to vmapped-z
_VMAP_THRESHOLD = 8
# chunk size for the vmapped path ((chunk, 2^n) intermediates)
_CHUNK = 64


def stream_route(n: int) -> str:
    """HBM-streaming expectation route for an ``n``-qubit state:
    ``"fused_static"`` (default <=30q: one pallas call per <=16 flip
    groups, conj side read once, roll+select permutes -- 80.25 ms /
    81.7% of HBM peak at 28q; at 30q the 256-row blocks reproducibly
    CRASHED the tunneled TPU worker (kernel fault, tpu_stream_30.log)
    but 128-row blocks run clean at 565.6 ms vs 1018 grouped, round-5
    mitigation, see _stream_block_rows), ``"grouped"`` (default above
    30q: untested fused-static territory), or ``"fused"`` (dynamic
    scalar-prefetch variant, kept for A/B).  QSFH_STREAM_FUSED=1 /
    QSFH_STREAM_FUSED_STATIC=0|1 override."""
    if os.environ.get("QSFH_STREAM_FUSED") == "1":
        return "fused"
    fs_default = "1" if n <= 30 else "0"
    if os.environ.get("QSFH_STREAM_FUSED_STATIC", fs_default) == "1":
        return "fused_static"
    return "grouped"


def group_by_x(op: PauliSum) -> Dict[int, Tuple[np.ndarray, np.ndarray]]:
    """Host-side grouping: x_mask -> (z_masks[], packed_coeffs[])."""
    groups: Dict[int, Tuple[list, list]] = defaultdict(lambda: ([], []))
    for x, z, c in zip(op.x, op.z, op.c):
        g = groups[int(x)]
        g[0].append(int(z))
        g[1].append(complex(c))
    return {
        x: (np.array(zs, dtype=np.uint64), np.array(cs, dtype=np.complex128))
        for x, (zs, cs) in groups.items()
    }


def _signed_weights(n: int, zb_arr: jnp.ndarray, c_arr: jnp.ndarray, dtype):
    """w_j[b] = c_j * (-1)^{popcount(b & zb_j)}, evaluated lazily per chunk."""
    idx = index_bits(n)

    def one(zb, c):
        par = jax.lax.population_count(idx & zb.astype(jnp.uint32)) & jnp.uint32(1)
        return c * (1.0 - 2.0 * par.astype(real_dtype(dtype))).astype(dtype)

    return one


def _group_diag_weight(n: int, zs: np.ndarray, cs: np.ndarray, dtype) -> jnp.ndarray:
    """Sum_j c_j (-1)^{z_j . b} for an x-group, as one fused vector."""
    dtype = canonical_dtype(dtype)
    rdt = real_dtype(dtype)
    if len(zs) <= _VMAP_THRESHOLD:
        acc = jnp.zeros(1 << n, dtype=dtype)
        for z, c in zip(zs, cs):
            zb = qmask_to_bmask(int(z), n)
            s = parity_signs(n, zb, rdt) if zb else jnp.ones(1 << n, rdt)
            acc = acc + const_complex(c, dtype) * s.astype(dtype)
        return acc
    # traced path: scan over chunks of terms
    idx = index_bits(n)
    zb_host = np.array([qmask_to_bmask(int(z), n) for z in zs], dtype=np.uint32)
    acc = jnp.zeros(1 << n, dtype=dtype)
    for start in range(0, len(zs), _CHUNK):
        zb = jnp.asarray(zb_host[start : start + _CHUNK])
        c = const_complex(cs[start : start + _CHUNK], dtype)

        def body(carry, zc):
            zbj, cj = zc
            par = jax.lax.population_count(idx & zbj) & jnp.uint32(1)
            sj = (1.0 - 2.0 * par.astype(rdt)).astype(dtype)
            return carry + cj * sj, None

        acc, _ = jax.lax.scan(body, acc, (zb, c))
    return acc


def diagonal_weight_vector(op: PauliSum, n: int, dtype=jnp.float64) -> jnp.ndarray:
    """D[b] such that (H_diag psi)[b] = D[b] psi[b] for the x==0 part of op.

    Real for Hermitian operators.  Precompute once per Hamiltonian; a whole
    diagonal generator layer then costs one elementwise pass.
    """
    dtype = canonical_dtype(dtype)
    groups = group_by_x(op)
    if 0 not in groups:
        return jnp.zeros(1 << n, dtype=dtype)
    zs, cs = groups[0]
    # the weights accumulate in the widest COMPLEX dtype the backend has
    # (canonical_dtype keeps x64-less backends warning-free)
    w = _group_diag_weight(n, zs, cs, canonical_dtype(jnp.complex128))
    return jnp.real(w).astype(dtype)


def apply_paulisum(psi: jnp.ndarray, n: int, op: PauliSum, groups=None) -> jnp.ndarray:
    """|out> = op |psi>, matrix-free, one flip per distinct x mask."""
    if groups is None:
        groups = group_by_x(op)
    out = jnp.zeros_like(psi)
    for x, (zs, cs) in groups.items():
        w = _group_diag_weight(n, zs, cs, psi.dtype)
        if x == 0:
            out = out + w * psi
        else:
            xb = qmask_to_bmask(x, n)
            # (c X^x Z^z psi)[b] = c (-1)^{z.(b^x)} psi[b^x]
            #                    = c (-1)^{|z&x|} (-1)^{z.b} psi[b^x]
            sign_zx = np.array(
                [(-1.0) ** bin(int(z) & x).count("1") for z in zs]
            )
            w_adj = _group_diag_weight(n, zs, cs * sign_zx, psi.dtype)
            out = out + w_adj * _xor_flip(psi, n, xb)
    return out


def expectation(psi: jnp.ndarray, n: int, op: PauliSum, groups=None) -> jnp.ndarray:
    """Re <psi| op |psi> (op Hermitian)."""
    if groups is None:
        groups = group_by_x(op)
    total = jnp.zeros((), dtype=real_dtype(psi.dtype))
    conj = jnp.conj(psi)
    for x, (zs, cs) in groups.items():
        if x == 0:
            w = _group_diag_weight(n, zs, cs, psi.dtype)
            total = total + jnp.real(jnp.sum(w * conj * psi))
        else:
            xb = qmask_to_bmask(x, n)
            sign_zx = np.array(
                [(-1.0) ** bin(int(z) & x).count("1") for z in zs]
            )
            w_adj = _group_diag_weight(n, zs, cs * sign_zx, psi.dtype)
            total = total + jnp.real(jnp.sum(w_adj * conj * _xor_flip(psi, n, xb)))
    return total


class Observable:
    """A Hamiltonian/observable prepared for repeated fast evaluation.

    Host-side grouping is done once; every `expectation`/`apply` call after
    that traces only fused flips and elementwise passes.  For operators
    with many flip-mask groups (iQCC dressed Hamiltonians grow per epoch)
    the ``*_scan`` variants keep the program size constant by scanning flat
    per-group arrays with traced masks.
    """

    # above this many x-groups the unrolled lowering becomes compile-hostile
    SCAN_GROUP_THRESHOLD = 96

    def __init__(self, op: PauliSum, n_qubits: int):
        self.op = op
        self.n = n_qubits
        self.groups = group_by_x(op)

    def expectation(self, psi: jnp.ndarray) -> jnp.ndarray:
        return expectation(psi, self.n, self.op, self.groups)

    def apply(self, psi: jnp.ndarray) -> jnp.ndarray:
        return apply_paulisum(psi, self.n, self.op, self.groups)

    # -- scan lowering ---------------------------------------------------------

    def _scan_terms(self):
        if not hasattr(self, "_scan_cache"):
            n = self.n
            xs, zs, cre, cim = [], [], [], []
            for x, z, c in zip(self.op.x, self.op.z, self.op.c):
                x, z = int(x), int(z)
                c_adj = complex(c) * ((-1.0) ** bin(z & x).count("1"))
                xs.append(qmask_to_bmask(x, n))
                zs.append(qmask_to_bmask(z, n))
                cre.append(c_adj.real)
                cim.append(c_adj.imag)
            self._scan_cache = (
                np.asarray(xs, np.uint32),
                np.asarray(zs, np.uint32),
                np.asarray(cre, np.float64),
                np.asarray(cim, np.float64),
            )
        return self._scan_cache

    def expectation_scan(self, psi: jnp.ndarray) -> jnp.ndarray:
        """Re <psi|op|psi> via one lax.scan over flat terms (constant HLO)."""
        from .compiled import xor_flip_traced

        n = self.n
        rdt = real_dtype(psi.dtype)
        xs, zs, cre, cim = self._scan_terms()

        from .pallas_kernels import chain_max_qubits, pallas_enabled

        if pallas_enabled() and 10 <= n <= chain_max_qubits() and rdt == jnp.float32:
            from .pallas_kernels import expectation_chain_pallas

            return expectation_chain_pallas(
                psi, n, xs, zs, cre.astype(np.float32), cim.astype(np.float32)
            )

        from .pallas_kernels import stream_max_qubits

        if (
            pallas_enabled()
            and chain_max_qubits() < n <= stream_max_qubits()
            and rdt == jnp.float32
        ):
            # beyond the VMEM-resident cap: HBM-streaming kernels.
            # Default route since round 4: FUSED-STATIC (one call per <=16
            # flip groups, conj side read once, roll+select permutes) --
            # measured 12.59 ms/eval at 26q = 73% of HBM spec peak vs the
            # per-group static form's 38 ms (tpu_fusedstatic_probe.json).
            # QSFH_STREAM_FUSED_STATIC=0 restores the per-group path;
            # QSFH_STREAM_FUSED=1 selects the dynamic scalar-prefetch
            # variant (kept for A/B).
            cre32, cim32 = cre.astype(np.float32), cim.astype(np.float32)
            rows = (1 << n) // 128
            route = stream_route(n)
            if route == "fused":
                from .pallas_kernels import expectation_stream_fused

                re = jnp.real(psi).astype(jnp.float32).reshape(rows, 128)
                im = jnp.imag(psi).astype(jnp.float32).reshape(rows, 128)
                return expectation_stream_fused(re, im, n, xs, zs, cre32, cim32)
            if route == "fused_static":
                from .pallas_kernels import expectation_stream_fused_static

                re = jnp.real(psi).astype(jnp.float32).reshape(rows, 128)
                im = jnp.imag(psi).astype(jnp.float32).reshape(rows, 128)
                return expectation_stream_fused_static(
                    re, im, n, xs, zs, cre32, cim32
                )
            from .pallas_kernels import expectation_stream_pallas

            return expectation_stream_pallas(psi, n, xs, zs, cre32, cim32)

        idx = index_bits(n)
        conj = jnp.conj(psi)

        def body(total, term):
            xb, zb, re, im = term
            from .compiled import _sign_plane

            t = xor_flip_traced(psi, n, xb)
            s = _sign_plane(idx, zb, n, rdt).astype(psi.dtype)
            val = jnp.sum(conj * s * t)
            return total + jnp.real((re + 1j * im).astype(psi.dtype) * val).astype(rdt), None

        total, _ = jax.lax.scan(
            body,
            jnp.zeros((), rdt),
            (
                jnp.asarray(xs),
                jnp.asarray(zs),
                jnp.asarray(cre, rdt),
                jnp.asarray(cim, rdt),
            ),
        )
        return total

    def apply_scan(self, psi: jnp.ndarray) -> jnp.ndarray:
        """op|psi> via one lax.scan over flat terms (constant HLO)."""
        from .compiled import xor_flip_traced

        n = self.n
        rdt = real_dtype(psi.dtype)
        xs, zs, cre, cim = self._scan_terms()

        from .pallas_kernels import chain_max_qubits, pallas_enabled

        if pallas_enabled() and 10 <= n <= chain_max_qubits() and rdt == jnp.float32:
            from .pallas_kernels import apply_chain_pallas

            return apply_chain_pallas(
                psi, n, xs, zs, cre.astype(np.float32), cim.astype(np.float32)
            )

        from .pallas_kernels import stream_max_qubits

        if (
            pallas_enabled()
            and chain_max_qubits() < n <= stream_max_qubits()
            and rdt == jnp.float32
        ):
            cre32, cim32 = cre.astype(np.float32), cim.astype(np.float32)
            if os.environ.get("QSFH_STREAM_FUSED") == "1":
                from .pallas_kernels import apply_stream_fused

                rows = (1 << n) // 128
                re = jnp.real(psi).astype(jnp.float32).reshape(rows, 128)
                im = jnp.imag(psi).astype(jnp.float32).reshape(rows, 128)
                ore, oim = apply_stream_fused(re, im, n, xs, zs, cre32, cim32)
                return (ore + 1j * oim).astype(psi.dtype).reshape(psi.shape)
            from .pallas_kernels import apply_stream_pallas

            return apply_stream_pallas(psi, n, xs, zs, cre32, cim32)

        idx = index_bits(n)

        def body(out, term):
            xb, zb, re, im = term
            from .compiled import _sign_plane

            t = xor_flip_traced(psi, n, xb)
            s = _sign_plane(idx, zb, n, rdt).astype(psi.dtype)
            return out + (re + 1j * im).astype(psi.dtype) * s * t, None

        out, _ = jax.lax.scan(
            body,
            jnp.zeros_like(psi),
            (
                jnp.asarray(xs),
                jnp.asarray(zs),
                jnp.asarray(cre, rdt),
                jnp.asarray(cim, rdt),
            ),
        )
        return out

    def expectation_auto(self, psi: jnp.ndarray) -> jnp.ndarray:
        """Pick the unrolled or scan lowering by group count."""
        if len(self.groups) > self.SCAN_GROUP_THRESHOLD:
            return self.expectation_scan(psi)
        return self.expectation(psi)

    def apply_auto(self, psi: jnp.ndarray) -> jnp.ndarray:
        if len(self.groups) > self.SCAN_GROUP_THRESHOLD:
            return self.apply_scan(psi)
        return self.apply(psi)

    def __len__(self):
        return len(self.op)


# -- ADAPT pool screening -----------------------------------------------------


class PackedPool:
    """A pool of Hermitian generators lowered for batched screening.

    For each generator G_k = sum_t c_t P_t we need  grad_k = 2 Im <w|G_k psi>.
    All (k, t) pairs are flattened and grouped by flip mask x, so the whole
    pool screening costs one reverse per distinct x plus fused elementwise
    passes -- the TPU replacement for the reference's whole-pool append +
    backprop (``/root/reference/models/adapt_vqe.py:306-314``).
    """

    def __init__(self, generators: Sequence[PauliSum], n_qubits: int):
        self.n = n_qubits
        self.generators = list(generators)
        self.size = len(self.generators)
        flat: Dict[int, Tuple[list, list, list]] = defaultdict(lambda: ([], [], []))
        for k, g in enumerate(self.generators):
            for x, z, c in zip(g.x, g.z, g.c):
                f = flat[int(x)]
                f[0].append(int(z))
                f[1].append(complex(c))
                f[2].append(k)
        self._groups = {
            x: (
                np.array(zs, dtype=np.uint64),
                np.array(cs, dtype=np.complex128),
                np.array(ks, dtype=np.int32),
            )
            for x, (zs, cs, ks) in flat.items()
        }

    def scan_arrays(self):
        """Flat per-term arrays (xb, zb, c_re, c_im, gen_index), built once.

        Coefficients carry the Z-past-X reorder sign so the scan/stream
        kernels can treat every term as X^x Z^z applied left-to-right.
        """
        if not hasattr(self, "_scan_arrays"):
            n = self.n
            xs, zs, cre, cim, ks = [], [], [], [], []
            for x, (zarr, carr, karr) in self._groups.items():
                xb = qmask_to_bmask(x, n)
                for z, c, k in zip(zarr, carr, karr):
                    zb = qmask_to_bmask(int(z), n)
                    c_adj = complex(c) * ((-1.0) ** bin(int(z) & x).count("1"))
                    xs.append(xb)
                    zs.append(zb)
                    cre.append(c_adj.real)
                    cim.append(c_adj.imag)
                    ks.append(k)
            self._scan_arrays = (
                np.asarray(xs, np.uint32),
                np.asarray(zs, np.uint32),
                np.asarray(cre, np.float64),
                np.asarray(cim, np.float64),
                np.asarray(ks, np.int32),
            )
        return self._scan_arrays

    def screen_scan(self, psi: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        """grad_k = 2 Im <w | G_k psi> via ONE lax.scan over flat pool terms.

        Constant compile size in pool size (the grouped :meth:`screen`
        unrolls one flip per distinct mask -- thousands of HLO equations
        for 3x3 pools, which remote TPU compile services cannot digest).
        """
        from .compiled import xor_flip_traced

        n = self.n
        rdt = real_dtype(psi.dtype)
        xs, zs, cre, cim, ks = self.scan_arrays()

        from .pallas_kernels import chain_max_qubits, pallas_enabled

        if pallas_enabled() and 10 <= n <= chain_max_qubits() and rdt == jnp.float32:
            from .pallas_kernels import screen_chain_pallas

            contribs = screen_chain_pallas(
                psi, w, n, xs, zs,
                cre.astype(np.float32), cim.astype(np.float32),
            )
            return jax.ops.segment_sum(
                contribs, jnp.asarray(ks), num_segments=self.size
            ).astype(rdt)

        from .pallas_kernels import stream_max_qubits

        if (
            pallas_enabled()
            and chain_max_qubits() < n <= stream_max_qubits()
            and rdt == jnp.float32
        ):
            from .pallas_kernels import screen_stream_pallas

            contribs, perm = screen_stream_pallas(
                psi, w, n, xs, zs,
                cre.astype(np.float32), cim.astype(np.float32),
            )
            return jax.ops.segment_sum(
                contribs, jnp.asarray(ks[perm]), num_segments=self.size
            ).astype(rdt)

        idx = index_bits(n)
        conj_w = jnp.conj(w)
        # scatter-free accumulation: the tunneled TPU backend rejects
        # gather/scatter lowerings (engine.compiled._select_params), so
        # each term adds contrib * its one-hot generator row (rows built
        # in-program from the int32 ks -- a host-materialized one-hot is
        # a T x size float literal, engine.compiled._onehot_rows)
        from .compiled import _onehot_rows

        onehot = _onehot_rows(ks, self.size, rdt)

        def body(grads, term):
            xb, zb, re, im, krow = term
            t = xor_flip_traced(psi, n, xb)
            par = jax.lax.population_count(idx & zb) & jnp.uint32(1)
            s = (1.0 - 2.0 * par.astype(rdt)).astype(psi.dtype)
            val = jnp.sum(conj_w * s * t)
            contrib = 2.0 * jnp.imag((re + 1j * im).astype(psi.dtype) * val).astype(rdt)
            return grads + contrib * krow, None

        grads0 = jnp.zeros(self.size, dtype=rdt)
        grads, _ = jax.lax.scan(
            body,
            grads0,
            (
                jnp.asarray(xs),
                jnp.asarray(zs),
                jnp.asarray(cre, rdt),
                jnp.asarray(cim, rdt),
                onehot,
            ),
        )
        return grads

    def screen(self, psi: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        """grad_k = 2 Im <w | G_k psi> for every generator, in one fused pass.

        psi: current (k-space) ansatz state; w: (U_FT^dag H U_FT) psi.
        """
        n = self.n
        rdt = real_dtype(psi.dtype)
        idx = index_bits(n)
        conj_w = jnp.conj(w)
        grads = jnp.zeros(self.size, dtype=rdt)
        for x, (zs, cs, ks) in self._groups.items():
            xb = qmask_to_bmask(x, n)
            flipped = _xor_flip(psi, n, xb) if xb else psi
            inner = conj_w * flipped  # shared across all terms in the group
            sign_zx = np.array([(-1.0) ** bin(int(z) & x).count("1") for z in zs])
            cs_adj = cs * sign_zx
            zb_host = np.array([qmask_to_bmask(int(z), n) for z in zs], dtype=np.uint32)
            for start in range(0, len(zs), _CHUNK):
                zb = jnp.asarray(zb_host[start : start + _CHUNK])
                c = const_complex(cs_adj[start : start + _CHUNK], psi.dtype)

                def term_val(zbj):
                    par = jax.lax.population_count(idx & zbj) & jnp.uint32(1)
                    sj = (1.0 - 2.0 * par.astype(rdt)).astype(psi.dtype)
                    return jnp.sum(inner * sj)

                vals = jax.vmap(term_val)(zb)  # (chunk,)
                contrib = 2.0 * jnp.imag(c * vals).astype(rdt)
                # scatter-free: (chunk,) @ one-hot (chunk, size) matmul,
                # rows built in-program (engine.compiled._onehot_rows)
                from .compiled import _onehot_rows

                oh = _onehot_rows(ks[start : start + _CHUNK], self.size, rdt)
                grads = grads + contrib @ oh
        return grads
