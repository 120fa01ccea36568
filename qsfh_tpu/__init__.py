"""qsfh_tpu: TPU-native variational quantum simulation of the Fermi-Hubbard model.

A ground-up JAX/XLA rebuild of the capabilities of
chuntse0514/Quantum-Simulation-of-Fermi-Hubbard-model (see SURVEY.md and
PARITY.md).  Driver classes live in :mod:`qsfh_tpu.algos`; the CLI is
``python -m qsfh_tpu.cli``.
"""

__version__ = "0.1.0"

__all__ = ["algos", "engine", "grad", "io", "linalg", "molecules", "ops", "parallel"]

# The TPU MXU's default f32 matmul truncates inputs to bfloat16.  Every
# matmul in this package is a 0/1 selection / permutation / one-hot
# contraction where that truncation silently corrupts amplitudes and
# parameters (measured on-chip: 1.6e-2 per-element permutation error,
# 6e-3 energy error on the 18q fused train step —
# benchmarks/tpu_op_probe.jsonl).  HIGHEST (multi-pass) reproduces exact
# f32 at negligible cost for these small structured operands.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
