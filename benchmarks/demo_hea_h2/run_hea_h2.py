#!/usr/bin/env python
"""HEA-VQE on H2: the reference's models/vqe_hea.py __main__ experiment
(:103-109: H2 at r=0.8, n_epoch=100, reps=5, lr=1e-1, threshold=0.002)
on this framework's VQE (algos/hea.py; the reference's final-layer
index bug is fixed there, hea.py:7-10).  Ground truth is the in-repo
sector-Lanczos FCI (no PySCF in this image)."""
import os, sys
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
os.chdir(HERE)
from qsfh_tpu.algos.hea import VQE
from qsfh_tpu.molecules import H2

molecule = H2(r=0.8)
vqe = VQE(molecule, n_epoch=100, reps=5, lr=1e-1, threshold=0.002,
          results_root=HERE)
vqe.run()
print("FCI:", molecule.fci_energy)
