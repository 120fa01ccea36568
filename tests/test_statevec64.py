"""Parity tests for the native f64 statevector engine (statevec64.cpp).

The native engine powers the flagship polish loop (benchmarks/demo_3x3/
polish_fast.py); its math must agree with the jax f64 stage path
(engine/compiled.py) to machine precision.  The reference delegates this
role to torch complex128 autodiff (/root/reference/models/hva.py:145).
"""

import numpy as np
import pytest

from qsfh_tpu.native import statevec

pytestmark = pytest.mark.skipif(
    not statevec.available(), reason="native statevec64 unavailable"
)


@pytest.fixture(scope="module")
def small_adapt(tmp_path_factory):
    import optax

    from qsfh_tpu.algos.adapt import ADAPT
    from qsfh_tpu.algos.adapt_fused import initial_state_reim

    vqe = ADAPT(
        n_epoch=0, threshold1=1e-2, threshold2=1e-2, x_dimension=2,
        y_dimension=2, n_electrons=4, n_spin_up=2, n_spin_down=2,
        tunneling=1, coulomb=6, plot=False, log_metrics=False,
        results_root=str(tmp_path_factory.mktemp("sv64")),
    )
    indices = [0, 3, 7, 11, 2, 5]
    step = vqe._build_step(indices, optax.adam(1e-3))
    psi0_r = initial_state_reim(vqe)
    return vqe, indices, step.raw_stages, psi0_r


def test_value_grad_state_parity(small_adapt):
    import jax.numpy as jnp

    vqe, indices, raw, psi0_r = small_adapt
    prog = statevec.Rot64Program.from_adapt(vqe, indices)
    rng = np.random.default_rng(7)
    th = rng.normal(0.0, 0.4, len(indices))

    psi_r = raw["fwd_from"](psi0_r, jnp.asarray(th))
    e_jax = float(raw["energy"](psi_r))
    lam_r = raw["cotangent"](psi_r)
    g_jax = np.asarray(raw["adjoint"](psi_r, lam_r, jnp.asarray(th)))

    psi0 = psi0_r[0] + 1j * psi0_r[1]
    e, g = prog.value_and_grad(th, psi0)
    assert abs(e - e_jax) < 1e-12
    np.testing.assert_allclose(g, g_jax, atol=1e-12)

    psi_native = prog.apply(th, psi0)
    psi_jax = np.asarray(psi_r[0] + 1j * psi_r[1])
    np.testing.assert_allclose(psi_native, psi_jax, atol=1e-12)


def test_energy_matches_value_and_grad(small_adapt):
    vqe, indices, _, psi0_r = small_adapt
    prog = statevec.Rot64Program.from_adapt(vqe, indices)
    psi0 = psi0_r[0] + 1j * psi0_r[1]
    th = np.linspace(-0.3, 0.5, len(indices))
    e, _ = prog.value_and_grad(th, psi0)
    assert abs(prog.energy(th, psi0) - e) < 1e-12


def test_grad_matches_finite_difference(small_adapt):
    vqe, indices, _, psi0_r = small_adapt
    prog = statevec.Rot64Program.from_adapt(vqe, indices)
    psi0 = psi0_r[0] + 1j * psi0_r[1]
    rng = np.random.default_rng(3)
    th = rng.normal(0.0, 0.2, len(indices))
    _, g = prog.value_and_grad(th, psi0)
    eps = 1e-6
    for k in (0, len(indices) // 2, len(indices) - 1):
        tp = th.copy()
        tp[k] += eps
        tm = th.copy()
        tm[k] -= eps
        fd = (prog.energy(tp, psi0) - prog.energy(tm, psi0)) / (2 * eps)
        assert abs(fd - g[k]) < 1e-7


def test_hvp_symmetry(small_adapt):
    # <u, H v> == <v, H u> for the (symmetric) Hessian via central FD
    vqe, indices, _, psi0_r = small_adapt
    prog = statevec.Rot64Program.from_adapt(vqe, indices)
    psi0 = psi0_r[0] + 1j * psi0_r[1]
    rng = np.random.default_rng(11)
    th = rng.normal(0.0, 0.2, len(indices))
    u = rng.normal(size=len(indices))
    v = rng.normal(size=len(indices))
    hu = prog.hvp(th, psi0, u)
    hv = prog.hvp(th, psi0, v)
    assert abs(np.dot(v, hu) - np.dot(u, hv)) < 1e-6
