from .mesh import (
    AMP_AXIS,
    amp_sharding,
    amplitude_mesh,
    constrain_amp,
    local_qubits,
    replicated,
    shard_statevector,
)
from .sharded_hva import build_sharded_hva_step
from .sharded_hva_shmap import build_sharded_hva_step_shmap
from .sharded_stream import sharded_expectation_stream

__all__ = [
    "sharded_expectation_stream",
    "AMP_AXIS",
    "amp_sharding",
    "amplitude_mesh",
    "constrain_amp",
    "local_qubits",
    "replicated",
    "shard_statevector",
    "build_sharded_hva_step",
    "build_sharded_hva_step_shmap",
]
