#!/usr/bin/env python
"""3x3 HVA on the degenerate ground manifold: the reference's
models/hva_for_3x3.py __main__ experiment (:373-392: n_epoch=800, reps=10,
lr=1e-2, periodic, 9 electrons 5up/4down) run on this framework's HVA with
degenerate_subspace=4 (the reference variant's manifold fidelity).  The
dense-ED manifold cache is shared with benchmarks/demo_3x3."""
import os, sys
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
os.chdir(HERE)
from qsfh_tpu.algos.hva import HVA

vqe = HVA(
    n_epoch=800, reps=10, lr=1e-2,
    x_dimension=3, y_dimension=3, n_electrons=9, n_spin_up=5, n_spin_down=4,
    tunneling=1, coulomb=6, degenerate_subspace=4,
    results_root=HERE, plot=True, log_metrics=True,
)
vqe.run()
print("ED:", vqe.ground_state_energy)
print("final loss:", vqe.results["loss"][-1])
