#!/usr/bin/env python
"""Continue the flagship 3x3 ADAPT demo at tightened 1e-3 thresholds.

Resumes the round-1 checkpoints (17 epochs, 5.12 mHa at 3e-3 thresholds)
and keeps growing/optimizing until the empty-selection criterion fires at
threshold 1e-3.
"""
import os, sys
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
os.chdir(HERE)
from qsfh_tpu.algos.adapt import ADAPT

vqe = ADAPT(
    n_epoch=40, threshold1=1e-3, threshold2=1e-3,
    x_dimension=3, y_dimension=3, n_electrons=9, n_spin_up=5, n_spin_down=4,
    tunneling=1, coulomb=6, degenerate_subspace=4,
    load_model=True, results_root=HERE, plot=True, log_metrics=True,
)
vqe.run()
print("FINAL epoch losses:", vqe.results["epoch loss"][-8:])
print("ED:", vqe.ground_state_energy)
