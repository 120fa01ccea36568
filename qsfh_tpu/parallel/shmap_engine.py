"""Explicit shard_map statevector engine: XOR ppermute + local flips.

The GSPMD path (:mod:`.sharded_hva`) lets the XLA partitioner infer
communication from sharding annotations.  This module is the explicit
counterpart for full control of the ICI traffic pattern and for scaling
past 32 qubits (local indices stay below the uint32 iota limit):

Global flat index b = (d, l):  d = top log2(D) bits (device coordinate on
the ``amp`` mesh axis), l = the local amplitude index.  For a Pauli string
with flip mask m = (m_hi, m_lo):

* local part:   t[l] = psi[l ^ m_lo]      -- static multi-axis flip
* cross part:   shard d holds what shard d ^ m_hi needs -- ONE
  ``jax.lax.ppermute`` along the XOR pairing (self-inverse permutation,
  the canonical amplitude-exchange pattern over ICI)
* Z phases factor:  sign(b) = sign_hi(d) * sign_lo(l); sign_hi is a
  per-device scalar from ``jax.lax.axis_index``.

Expectations reduce locally then ``psum`` over the axis.

Everything is matrix-free on packed (x, z, coeff) data, mirroring the
single-shard engine (qsfh_tpu.engine) semantics exactly -- verified
against it in tests/test_shmap_engine.py on the virtual 8-device mesh.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.gates import _xor_flip
from ..engine.state import const_complex, real_dtype
from .mesh import AMP_AXIS


def _local_parity_signs(n_local: int, m_lo: int, rdt):
    idx = jax.lax.iota(jnp.uint32, 1 << n_local)
    par = jax.lax.population_count(idx & jnp.uint32(m_lo)) & jnp.uint32(1)
    return 1.0 - 2.0 * par.astype(rdt)


def _device_sign(z_hi: int, rdt):
    """(-1)^popcount(axis_index & z_hi) as a traced per-device scalar."""
    d = jax.lax.axis_index(AMP_AXIS).astype(jnp.uint32)
    par = jax.lax.population_count(d & jnp.uint32(z_hi)) & jnp.uint32(1)
    return 1.0 - 2.0 * par.astype(rdt)


def _xor_ppermute(t: jnp.ndarray, m_hi: int, n_devices: int) -> jnp.ndarray:
    if m_hi == 0:
        return t
    perm = [(d, d ^ m_hi) for d in range(n_devices)]
    return jax.lax.ppermute(t, AMP_AXIS, perm)


class ShardedPauliEngine:
    """Matrix-free sharded gate/expectation kernels for one (n, mesh) pair.

    Masks are split host-side per Pauli string; the per-shard program uses
    only local flips, per-device scalars, and XOR ppermutes.
    """

    def __init__(self, n_qubits: int, mesh: Mesh):
        self.n = n_qubits
        self.mesh = mesh
        self.n_devices = mesh.devices.size
        self.k = int(np.log2(self.n_devices))
        if 1 << self.k != self.n_devices:
            raise ValueError("device count must be a power of two")
        self.n_local = n_qubits - self.k

    # -- building blocks (call INSIDE shard_map) ------------------------------

    def apply_pauli_local(self, psi_l, x: int, z: int):
        """P|psi> on the local shard for the Hermitian string P(x, z)."""
        rdt = real_dtype(psi_l.dtype)
        xb = self._flat(x)
        x_hi, x_lo = _split_mask_flat(xb, self.n, self.k)
        zb = self._flat(z)
        z_hi, z_lo = _split_mask_flat(zb, self.n, self.k)

        t = _xor_flip(psi_l, self.n_local, x_lo)
        t = _xor_ppermute(t, x_hi, self.n_devices)
        # t[b] (-1)^{z.b} = (-1)^{|z&x|} (X^x Z^z psi)[b]; the (-i)^{|x&z|}
        # phase turns that into the Hermitian string P = i^{|x&z|} X^x Z^z
        # (same bookkeeping as engine.gates.apply_pauli_string)
        s = _local_parity_signs(self.n_local, z_lo, rdt) * _device_sign(z_hi, rdt)
        k4 = bin(x & z).count("1") % 4
        phase = (-1j) ** k4
        out = t * s.astype(psi_l.dtype)
        if phase != 1:
            out = out * const_complex(phase, psi_l.dtype)
        return out

    def _flat(self, qmask: int) -> int:
        out = 0
        for q in range(self.n):
            if (qmask >> q) & 1:
                out |= 1 << (self.n - 1 - q)
        return out

    def pauli_rotation_local(self, psi_l, x: int, z: int, theta):
        rdt = real_dtype(psi_l.dtype)
        theta = jnp.asarray(theta, dtype=rdt)
        if x == 0:
            zb = self._flat(z)
            z_hi, z_lo = _split_mask_flat(zb, self.n, self.k)
            s = _local_parity_signs(self.n_local, z_lo, rdt) * _device_sign(z_hi, rdt)
            return psi_l * (jnp.cos(theta) - 1j * s * jnp.sin(theta)).astype(psi_l.dtype)
        p_psi = self.apply_pauli_local(psi_l, x, z)
        c = jnp.cos(theta).astype(psi_l.dtype)
        s = jnp.sin(theta).astype(psi_l.dtype)
        return c * psi_l - 1j * s * p_psi

    def generator_rotation_local(self, psi_l, rot_terms, theta):
        for (x, z, scale) in rot_terms:
            psi_l = self.pauli_rotation_local(psi_l, x, z, theta * scale)
        return psi_l

    def apply_paulisum_local(self, psi_l, op) -> jnp.ndarray:
        """op|psi> on the local shard (op: PauliSum, packed coeffs)."""
        out = jnp.zeros_like(psi_l)
        for x, z, c in zip(op.x, op.z, op.c):
            x, z = int(x), int(z)
            coeff = const_complex(complex(c) * _string_phase(x, z), psi_l.dtype)
            out = out + coeff * self.apply_pauli_local(psi_l, x, z)
        return out

    def apply_generator_local(self, psi_l, rot_terms) -> jnp.ndarray:
        """G|psi> for G = sum scale * P (rotation_terms form; all real)."""
        out = jnp.zeros_like(psi_l)
        for (x, z, scale) in rot_terms:
            out = out + scale * self.apply_pauli_local(psi_l, x, z)
        return out

    def expectation_local(self, psi_l, op) -> jnp.ndarray:
        """Per-shard partial of Re<psi|op|psi>; psum at the end."""
        rdt = real_dtype(psi_l.dtype)
        conj = jnp.conj(psi_l)
        total = jnp.zeros((), dtype=rdt)
        for x, z, c in zip(op.x, op.z, op.c):
            term = self.apply_pauli_local(psi_l, int(x), int(z))
            coeff = const_complex(complex(c) * _string_phase(int(x), int(z)), psi_l.dtype)
            total = total + jnp.real(jnp.sum(coeff * conj * term))
        return jax.lax.psum(total, AMP_AXIS)

    def apply_two_qubit_local(self, psi_l, U4, qa: int, qb: int):
        """Arbitrary 4x4 unitary on wires (qa, qb), either wire may be sharded.

        out[b] = sum_{s,t} U[(b_a b_b), (s t)] psi[b with bits a,b := s,t].
        Written as four fused multiply-adds over the XOR-shifted copies
        psi, psi^A, psi^B, psi^AB (each shift = local flip and/or one
        ppermute), with elementwise coefficient vectors selected by the
        CURRENT bit values -- no gathers, no data-dependent control flow.
        """
        rdt = real_dtype(psi_l.dtype)
        U = np.asarray(U4, dtype=np.complex128).reshape(4, 4)
        fa = self._flat(1 << qa)
        fb = self._flat(1 << qb)

        # bit-value indicators for the CURRENT index b (0 or 1 vectors),
        # factored into device scalar x local vector
        def bit_vec(flat_one_bit):
            hi, lo = _split_mask_flat(flat_one_bit, self.n, self.k)
            if hi:
                d = jax.lax.axis_index(AMP_AXIS).astype(jnp.uint32)
                v = (jax.lax.population_count(d & jnp.uint32(hi)) & jnp.uint32(1)).astype(rdt)
                return jnp.broadcast_to(v, (1 << self.n_local,))
            idx = jax.lax.iota(jnp.uint32, 1 << self.n_local)
            return ((idx >> jnp.uint32(int(np.log2(lo)))) & jnp.uint32(1)).astype(rdt)

        ba = bit_vec(fa)
        bb = bit_vec(fb)

        def shifted(mask_flat):
            hi, lo = _split_mask_flat(mask_flat, self.n, self.k)
            t = _xor_flip(psi_l, self.n_local, lo)
            return _xor_ppermute(t, hi, self.n_devices)

        copies = {
            (0, 0): psi_l,
            (1, 0): shifted(fa),
            (0, 1): shifted(fb),
            (1, 1): shifted(fa | fb),
        }

        out = jnp.zeros_like(psi_l)
        for (da, db), shift in copies.items():
            # row index r = (b_a b_b); source column = (b_a^da, b_b^db)
            # coefficient at b: U[r, c(b)] -- expand over the 4 r values
            coeff = jnp.zeros((1 << self.n_local,), dtype=psi_l.dtype)
            for ra in (0, 1):
                for rb in (0, 1):
                    u = complex(U[2 * ra + rb, 2 * (ra ^ da) + (rb ^ db)])
                    if u == 0:
                        continue
                    ind_a = ba if ra == 1 else (1.0 - ba)
                    ind_b = bb if rb == 1 else (1.0 - bb)
                    coeff = coeff + const_complex(u, psi_l.dtype) * (ind_a * ind_b).astype(
                        psi_l.dtype
                    )
            out = out + coeff * shift
        return out

    def rz_layer_local(self, psi_l, angles):
        """A whole layer of static RZ(angles[q]) as one fused elementwise pass.

        The phase factors over (device, local) bits, so no 2^n host constant
        is needed at any qubit count: a local angle-sum vector (built from
        iota in-program) plus a per-device scalar.
        """
        rdt = real_dtype(psi_l.dtype)
        idx = jax.lax.iota(jnp.uint32, 1 << self.n_local)
        t_lo = jnp.zeros((1 << self.n_local,), dtype=rdt)
        t_hi = jnp.zeros((), dtype=rdt)
        d = jax.lax.axis_index(AMP_AXIS).astype(jnp.uint32)
        for q in range(self.n):
            a = float(angles[q])
            if a == 0.0:
                continue
            p = self.n - 1 - q  # flat bit
            if p >= self.n_local:  # sharded bit
                bit = (d >> jnp.uint32(p - self.n_local)) & jnp.uint32(1)
                t_hi = t_hi + (a / 2) * (1.0 - 2.0 * bit.astype(rdt))
            else:
                bit = (idx >> jnp.uint32(p)) & jnp.uint32(1)
                t_lo = t_lo + (a / 2) * (1.0 - 2.0 * bit.astype(rdt))
        total = t_lo + t_hi
        return psi_l * (jnp.cos(total) - 1j * jnp.sin(total)).astype(psi_l.dtype)

    def givens_network_local(self, psi_l, diagonal, decomposition):
        """The full FT/Slater Givens network on the sharded state
        (fused form matching engine.circuits.apply_givens_network)."""
        from ..engine.gates import givens_plan_matrix

        angles = [float(np.angle(diagonal[i])) for i in range(self.n)]
        psi_l = self.rz_layer_local(psi_l, angles)
        for parallel_ops in reversed(decomposition):
            for op in parallel_ops:
                if op == "pht":
                    psi_l = self.apply_pauli_local(psi_l, 1 << (self.n - 1), 0)
                else:
                    i, j, theta, phi = op
                    M = givens_plan_matrix(float(theta), float(phi))
                    psi_l = self.apply_two_qubit_local(psi_l, M, i, j)
        return psi_l

    def givens_network_inverse_local(self, psi_l, diagonal, decomposition):
        """Exact inverse of :meth:`givens_network_local` (for adjoint replay)."""
        from ..engine.gates import givens_plan_matrix

        for parallel_ops in decomposition:
            for op in reversed(parallel_ops):
                if op == "pht":
                    psi_l = self.apply_pauli_local(psi_l, 1 << (self.n - 1), 0)
                else:
                    i, j, theta, phi = op
                    M = givens_plan_matrix(float(theta), float(phi)).conj().T
                    psi_l = self.apply_two_qubit_local(psi_l, M, i, j)
        angles = [-float(np.angle(diagonal[i])) for i in range(self.n)]
        return self.rz_layer_local(psi_l, angles)

    def basis_state_local(self, occupied_qubits, dtype=jnp.complex64):
        """Computational basis state, built per shard (no host constant)."""
        index = 0
        for q in occupied_qubits:
            index |= 1 << (self.n - 1 - q)
        hi = index >> self.n_local
        lo = index & ((1 << self.n_local) - 1)
        d = jax.lax.axis_index(AMP_AXIS)
        psi_l = jnp.zeros(1 << self.n_local, dtype=dtype)
        hit = (d == hi).astype(psi_l.dtype)
        return psi_l.at[lo].set(1.0) * hit

    # -- jit-ready wrappers ----------------------------------------------------

    def shard_spec(self):
        return NamedSharding(self.mesh, P(AMP_AXIS))

    def wrap(
        self,
        fn,
        n_state_args: int = 1,
        out_replicated: bool = True,
        n_scalar_args: int = 0,
    ):
        """shard_map a function of (state..., *scalars) over the amp axis.

        The first ``n_state_args`` arguments are amplitude-sharded; the
        following ``n_scalar_args`` (replicated scalars/parameter arrays)
        get ``P()`` specs -- previously the spec tuple covered only the
        state args, so any wrapped function with scalar args failed at
        call time with a specs/args structure mismatch.
        """
        in_specs = tuple([P(AMP_AXIS)] * n_state_args + [P()] * n_scalar_args)
        out_spec = P() if out_replicated else P(AMP_AXIS)
        return shard_map(
            fn,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=out_spec,
            check_vma=False,
        )


def _split_mask_flat(flat_mask: int, n: int, k: int):
    """Split a FLAT bitmask into (device-bits value, local flat mask)."""
    hi = flat_mask >> (n - k)
    lo = flat_mask & ((1 << (n - k)) - 1)
    return hi, lo


def _string_phase(x: int, z: int) -> complex:
    """Convert a packed (X^x Z^z) coefficient to the Hermitian-string
    (Y-convention) coefficient: c_str = c_packed * (-i)^{|x&z|}, matching
    PauliSum.string_coeffs().  apply_pauli_local produces P|psi> for the
    Hermitian string, so  c_packed X^x Z^z = c_str P.
    """
    return (-1j) ** (bin(x & z).count("1") % 4)


def sharded_expectation(engine: ShardedPauliEngine, op):
    """Build a jitted sharded Re<psi|op|psi> closure."""

    def fn(psi_l):
        return engine.expectation_local(psi_l, op)

    return jax.jit(engine.wrap(fn))
