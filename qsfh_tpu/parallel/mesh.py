"""Device mesh + amplitude-sharding helpers.

The reference has no distributed backend at all (single process, one
optional CUDA GPU -- see SURVEY.md §2.3); its only scale mechanism is a
backend switch at 20 qubits (``/root/reference/models/adapt_vqe.py:299-304``).
The TPU-native scale axis is the statevector itself: the 2^n-amplitude
vector is sharded over an ``amp`` mesh axis, gates on low qubits stay
shard-local, and gates on high (sharded) qubits compile to XLA
collective-permutes over ICI.  We express shardings with
``jax.sharding.NamedSharding`` and let the SPMD partitioner insert the
collectives -- no hand-written NCCL-style exchange.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AMP_AXIS = "amp"


def amplitude_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the amplitude axis.

    ``n_devices`` must be a power of two so that it divides every 2^n
    statevector dimension.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    n = len(devices)
    if n & (n - 1):
        raise ValueError(f"amplitude mesh needs a power-of-two device count, got {n}")
    return Mesh(np.array(devices), (AMP_AXIS,))


def amp_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding of a flat (2^n,) statevector: leading bits across devices."""
    return NamedSharding(mesh, P(AMP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_statevector(psi: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Place a flat statevector with its leading (high-qubit) bits sharded."""
    return jax.device_put(psi, amp_sharding(mesh))


def constrain_amp(psi: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Pin the amp sharding inside jit so GSPMD keeps the vector distributed.

    Insert after each circuit layer: without the constraint the partitioner
    may float intermediate layouts toward replication on small test shapes.
    """
    return jax.lax.with_sharding_constraint(psi, amp_sharding(mesh))


def local_qubits(n_qubits: int, mesh: Mesh) -> int:
    """Number of low qubits whose gates never cross a shard boundary.

    Qubit q occupies flat-index bit (n-1-q); the leading log2(D) bits
    (qubits 0..log2(D)-1) are the sharded ones.
    """
    d = mesh.devices.size
    return n_qubits - int(np.log2(d))
