"""Amplitude-sharded HBM-streaming expectation: Pallas kernels under shard_map.

The single-chip streaming family (``engine/pallas_kernels.py``) evaluates
Re<psi|H|psi> for statevectors too large for VMEM by pairing HBM blocks
across each term's flip mask.  This module lifts that to the amplitude-
sharded regime (the >30-qubit scale axis, SURVEY.md section 5.7): the
global flat index is (d, l) with d = the top log2(D) bits on the ``amp``
mesh axis, and a Pauli term's flip/phase masks split into

* x_hi  -- shard bits of the flip: ONE ``ppermute`` of the f32 planes per
  distinct pattern delivers the partner shard (the XOR pairing over ICI);
* z_hi  -- shard bits of the phase: a per-device scalar sign from
  ``axis_index`` multiplying that group's kernel output;
* x_lo/z_lo -- handled INSIDE the unchanged streaming kernel on the local
  planes (block pairing + lane permutes + in-block parity planes), with
  the partner planes fed through the kernel's partner-side inputs.

Per-shard partials ``psum`` over the axis.  Parity with the unsharded
``Observable.expectation`` is pinned in tests/test_parallel.py and
exercised by ``__graft_entry__.dryrun_multichip`` (VERDICT r3 next #6).

Reference counterpart: none -- the reference is single-device
(``/root/reference/models/adapt_vqe.py:299-304`` switches CUDA backends
instead of sharding); this is the TPU-native scale-out of its >=20-qubit
capability.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.state import qmask_to_bmask
from .mesh import AMP_AXIS
from .shmap_engine import ShardedPauliEngine, _xor_ppermute

LANE = 128


def pack_stream_groups(
    op, n: int, k: int
) -> Dict[Tuple[int, int], Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Host prep: op terms split by their (x_hi, z_hi) shard-bit patterns.

    Returns {(x_hi, z_hi): (xlo, zlo, cre, cim)} with the LOCAL flat masks
    and the (-1)^{|z & x|}-adjusted coefficients the streaming kernels
    expect (same convention as Observable._scan_terms).
    """
    lo_mask = (1 << (n - k)) - 1
    groups: Dict[Tuple[int, int], List[List]] = {}
    for x, z, c in zip(op.x, op.z, op.c):
        x, z = int(x), int(z)
        c_adj = complex(c) * ((-1.0) ** bin(z & x).count("1"))
        xb = qmask_to_bmask(x, n)
        zb = qmask_to_bmask(z, n)
        key = (xb >> (n - k), zb >> (n - k))
        groups.setdefault(key, []).append(
            [xb & lo_mask, zb & lo_mask, c_adj.real, c_adj.imag]
        )
    packed = {}
    for key, terms in sorted(groups.items()):
        arr = np.asarray(terms, np.float64)
        packed[key] = (
            np.asarray([t[0] for t in terms], np.uint32),
            np.asarray([t[1] for t in terms], np.uint32),
            arr[:, 2].astype(np.float32),
            arr[:, 3].astype(np.float32),
        )
    return packed


def _device_sign_f32(z_hi: int):
    """(-1)^popcount(axis_index & z_hi) as a traced f32 scalar."""
    if z_hi == 0:
        return jnp.float32(1.0)
    d = jax.lax.axis_index(AMP_AXIS).astype(jnp.uint32)
    par = jax.lax.population_count(d & jnp.uint32(z_hi)) & jnp.uint32(1)
    return 1.0 - 2.0 * par.astype(jnp.float32)


def expectation_stream_local(engine: ShardedPauliEngine, psi_l, packed):
    """Per-shard streaming Re<psi|op|psi>; call INSIDE shard_map.

    ``packed`` from :func:`pack_stream_groups`.  Returns the replicated
    (already psummed) f32 scalar.
    """
    from ..engine.pallas_kernels import expectation_stream_planes

    n_local = engine.n_local
    if n_local < 11:
        raise ValueError(
            f"streaming needs >= 11 local qubits (2 HBM blocks); got "
            f"{n_local} -- use the VMEM/XLA paths at this size"
        )
    rows = (1 << n_local) // LANE
    re = jnp.real(psi_l).astype(jnp.float32).reshape(rows, LANE)
    im = jnp.imag(psi_l).astype(jnp.float32).reshape(rows, LANE)

    total = jnp.float32(0.0)
    for (x_hi, z_hi), (xlo, zlo, cre, cim) in packed.items():
        if x_hi == 0:
            pre, pim = re, im
        else:
            pre = _xor_ppermute(re, x_hi, engine.n_devices)
            pim = _xor_ppermute(im, x_hi, engine.n_devices)
        val = expectation_stream_planes(
            re, im, n_local, xlo, zlo, cre, cim, partner_re=pre, partner_im=pim
        )
        total = total + _device_sign_f32(z_hi) * val
    return jax.lax.psum(total, AMP_AXIS)


def sharded_expectation_stream(engine: ShardedPauliEngine, op):
    """Jitted sharded streaming Re<psi|op|psi> closure over the amp axis."""
    packed = pack_stream_groups(op, engine.n, engine.k)

    def fn(psi_l):
        return expectation_stream_local(engine, psi_l, packed)

    return jax.jit(engine.wrap(fn))
