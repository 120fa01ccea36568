#!/usr/bin/env python
"""Resume the 3x3 HVA demo past the reference's 800-epoch budget
(load_model epoch-resume at flagship scale; still descending at 800)."""
import os, sys
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
os.chdir(HERE)
from qsfh_tpu.algos.hva import HVA

vqe = HVA(
    n_epoch=2000, reps=10, lr=1e-2,
    x_dimension=3, y_dimension=3, n_electrons=9, n_spin_up=5, n_spin_down=4,
    tunneling=1, coulomb=6, degenerate_subspace=4,
    load_model=True, results_root=HERE, plot=True, log_metrics=True,
)
vqe.run()
print("ED:", vqe.ground_state_energy)
print("final loss:", vqe.results["loss"][-1])
