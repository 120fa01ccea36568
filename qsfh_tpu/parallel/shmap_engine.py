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

from functools import partial
from typing import Sequence

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

    # -- jit-ready wrappers ----------------------------------------------------

    def shard_spec(self):
        return NamedSharding(self.mesh, P(AMP_AXIS))

    def wrap(self, fn, n_state_args: int = 1, out_replicated: bool = True):
        """shard_map a function of (state..., *scalars) over the amp axis."""
        in_specs = tuple([P(AMP_AXIS)] * n_state_args)
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
