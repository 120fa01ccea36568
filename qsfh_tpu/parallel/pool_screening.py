"""Device-parallel ADAPT pool screening (the data-parallel axis).

SURVEY.md §2.3: the reference's only pool-scale mechanism is evaluating all
pool gradients in one backprop pass on one device.  Here the flat pool-term
arrays shard across the mesh: every device holds the (replicated) ansatz
state psi and cotangent w, scans ITS slice of the pool terms, accumulates
into a full-size gradient vector, and a single psum combines the shards.
Composes with amplitude sharding (different runs, same mesh) and scales
screening throughput linearly in device count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..engine.compiled import xor_flip_traced
from ..engine.expectation import PackedPool
from ..engine.state import index_bits, real_dtype
from .mesh import AMP_AXIS


def build_sharded_pool_screen(pool: PackedPool, mesh, axis: str = AMP_AXIS):
    """Returns screen(psi, w) -> grads with pool terms sharded over ``axis``.

    grads_k = 2 Im <w | G_k psi> for every pool generator, identical to
    PackedPool.screen_scan up to summation order.
    """
    n = pool.n
    n_dev = mesh.devices.size
    xs, zs, cre, cim, ks = _flat_terms(pool)

    # pad to a multiple of the device count with no-op terms (k = size slot
    # that is sliced off afterwards, coefficient 0)
    T = len(xs)
    pad = (-T) % n_dev
    if pad:
        xs = np.concatenate([xs, np.zeros(pad, np.uint32)])
        zs = np.concatenate([zs, np.zeros(pad, np.uint32)])
        cre = np.concatenate([cre, np.zeros(pad)])
        cim = np.concatenate([cim, np.zeros(pad)])
        ks = np.concatenate([ks, np.full(pad, pool.size, np.int32)])

    xs_d = jnp.asarray(xs)
    zs_d = jnp.asarray(zs)
    # scatter-free accumulation: one-hot generator rows travel with the
    # sharded term data instead of integer ks (the TPU backend rejects
    # gather/scatter lowerings -- engine.compiled._select_params); rows
    # are built in-program from the int32 ks so no T x size float
    # literal lands in the HLO (engine.compiled._onehot_rows)
    ks_host = np.asarray(ks, np.int32)

    def local(psi, w, xb_l, zb_l, cre_l, cim_l, krow_l):
        rdt = real_dtype(psi.dtype)
        idx = index_bits(n)
        conj_w = jnp.conj(w)

        def body(grads, term):
            xb, zb, re, im, krow = term
            t = xor_flip_traced(psi, n, xb)
            par = jax.lax.population_count(idx & zb) & jnp.uint32(1)
            s = (1.0 - 2.0 * par.astype(rdt)).astype(psi.dtype)
            val = jnp.sum(conj_w * s * t)
            contrib = 2.0 * jnp.imag((re + 1j * im).astype(psi.dtype) * val).astype(rdt)
            return grads + contrib * krow, None

        grads0 = jnp.zeros(pool.size + 1, dtype=rdt)
        grads, _ = jax.lax.scan(body, grads0, (xb_l, zb_l, cre_l, cim_l, krow_l))
        return jax.lax.psum(grads, axis)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )

    def screen(psi, w):
        rdt = real_dtype(psi.dtype)
        from ..engine.compiled import _onehot_rows

        grads = fn(
            psi,
            w,
            xs_d,
            zs_d,
            jnp.asarray(cre, rdt),
            jnp.asarray(cim, rdt),
            _onehot_rows(ks_host, pool.size + 1, rdt),
        )
        return grads[: pool.size]

    return jax.jit(screen)


def _flat_terms(pool: PackedPool):
    from ..engine.state import qmask_to_bmask

    xs, zs, cre, cim, ks = [], [], [], [], []
    for x, (zarr, carr, karr) in pool._groups.items():
        xb = qmask_to_bmask(x, pool.n)
        for z, c, k in zip(zarr, carr, karr):
            zb = qmask_to_bmask(int(z), pool.n)
            c_adj = complex(c) * ((-1.0) ** bin(int(z) & x).count("1"))
            xs.append(xb)
            zs.append(zb)
            cre.append(c_adj.real)
            cim.append(c_adj.imag)
            ks.append(k)
    return (
        np.asarray(xs, np.uint32),
        np.asarray(zs, np.uint32),
        np.asarray(cre, np.float64),
        np.asarray(cim, np.float64),
        np.asarray(ks, np.int32),
    )
