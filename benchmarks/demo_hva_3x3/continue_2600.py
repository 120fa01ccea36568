#!/usr/bin/env python
"""Recover + extend the 3x3 HVA demo after the optimizer-state incident.

A session restart resumed the run at epoch 1991 with fresh Adam moments
and kicked the converged iterate (loss -5.5404, fid 0.9947) off the
minimum (final -5.3646 at epoch 2000).  Checkpoints now persist the
optimizer state (io/checkpoint.py), so this continuation pays the fresh
-Adam transient once more on the legacy checkpoint and then every future
resume is seamless.
"""
import os, sys
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
os.chdir(HERE)
from qsfh_tpu.algos.hva import HVA

vqe = HVA(
    n_epoch=2600, reps=10, lr=1e-2,
    x_dimension=3, y_dimension=3, n_electrons=9, n_spin_up=5, n_spin_down=4,
    tunneling=1, coulomb=6, degenerate_subspace=4,
    load_model=True, results_root=HERE, plot=True, log_metrics=True,
)
vqe.run()
print("ED:", vqe.ground_state_energy)
print("final loss:", vqe.results["loss"][-1])
print("final fidelity:", vqe.results["fidelity"][-1])
