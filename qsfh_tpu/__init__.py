"""qsfh_tpu: TPU-native variational quantum simulation of the Fermi-Hubbard model.

A ground-up JAX/XLA rebuild of the capabilities of
chuntse0514/Quantum-Simulation-of-Fermi-Hubbard-model (see SURVEY.md and
PARITY.md).  Driver classes live in :mod:`qsfh_tpu.algos`; the CLI is
``python -m qsfh_tpu.cli``.
"""

__version__ = "0.1.0"

__all__ = ["algos", "engine", "grad", "io", "linalg", "molecules", "ops", "parallel"]
