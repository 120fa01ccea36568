from .adjoint import (
    adjoint_apply,
    build_adjoint_energy,
    expectation_value,
    givens_network_ops,
)

__all__ = [
    "adjoint_apply",
    "build_adjoint_energy",
    "expectation_value",
    "givens_network_ops",
]
