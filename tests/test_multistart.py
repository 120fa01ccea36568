"""Batched multistart VQE (qsfh_tpu/algos/multistart.py).

The capability has no reference counterpart (the reference trains one
parameter vector per process, models/hva.py:305-355); these tests pin the
two claims the module makes: vmap-parity with the single-start loss, and
mesh-sharded batch training reproducing the unsharded run exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp

import optax
import pytest

from qsfh_tpu.algos.multistart import (
    MultistartHEA,
    MultistartHVA,
    batched_train,
    start_mesh,
)


def _make(n_starts, mesh_devices=None, n_epoch=25, seed=3):
    return MultistartHVA(
        n_starts=n_starts,
        n_epoch=n_epoch,
        reps=2,
        lr=5e-2,
        x_dimension=2,
        y_dimension=2,
        n_electrons=4,
        n_spin_up=2,
        n_spin_down=2,
        tunneling=1.0,
        coulomb=6.0,
        init_scale=0.1,
        seed=seed,
        mesh_devices=mesh_devices,
        ground_truth=False,
        results_root="/tmp/qsfh_multistart_results",
    )


def test_batched_loss_matches_single():
    ms = _make(3)
    vals = jax.vmap(ms.loss)(ms.batch_params)
    for b in range(3):
        single = ms.loss({k: v[b] for k, v in ms.batch_params.items()})
        np.testing.assert_allclose(float(single), float(vals[b]), rtol=1e-12)


@pytest.mark.slow
def test_run_improves_every_start_and_reports_best():
    ms = _make(4, n_epoch=40)
    out = ms.run()
    assert out["energies"].shape == (40, 4)
    first = out["energies"][0]
    last = out["final_energies"]
    # every start must improve over its own init energy
    assert (last < first - 1e-3).all()
    assert out["best_index"] == int(last.argmin())
    assert out["best_energy"] == pytest.approx(float(last.min()))
    # best params re-evaluate to the reported best energy
    re_eval = float(ms.loss({k: jnp.asarray(v) for k, v in out["best_params"].items()}))
    assert re_eval == pytest.approx(out["best_energy"], rel=1e-10)


@pytest.mark.slow
def test_mesh_sharded_matches_unsharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    a = _make(8, n_epoch=15, seed=11).run()
    b = _make(8, mesh_devices=8, n_epoch=15, seed=11).run()
    np.testing.assert_allclose(a["final_energies"], b["final_energies"],
                               rtol=1e-10, atol=1e-12)
    assert a["best_index"] == b["best_index"]
    np.testing.assert_allclose(a["energies"], b["energies"], rtol=1e-9, atol=1e-11)


@pytest.mark.slow
def test_sharded_scan_body_has_no_collectives():
    """Each start is independent: the DP training body must compile to zero
    cross-device collectives (the final argmin happens on host)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    ms = _make(8, mesh_devices=8, n_epoch=3, seed=5)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(ms.mesh, P("start"))
    params = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), ms.batch_params
    )
    opt = optax.adam(1e-2)

    def run(p):
        state = opt.init(p)

        def body(carry, _):
            pp, ss = carry
            vals, grads = jax.vmap(jax.value_and_grad(ms.loss))(pp)
            upd, ss = opt.update(grads, ss, pp)
            return (optax.apply_updates(pp, upd), ss), vals

        (p, _), traj = jax.lax.scan(body, (p, state), None, length=3)
        return traj

    txt = jax.jit(run).lower(params).compile().as_text()
    for coll in ("all-reduce", "collective-permute", "all-gather", "all-to-all"):
        assert coll not in txt, f"unexpected {coll} in DP multistart program"


def test_batched_train_generic_loss():
    """batched_train is ansatz-agnostic: a quadratic bowl converges per-row."""
    target = jnp.asarray(np.array([1.0, -2.0, 3.0]))

    def loss(p):
        return jnp.sum((p["x"] - target) ** 2)

    rng = np.random.default_rng(0)
    batch = {"x": jnp.asarray(rng.normal(size=(5, 3)))}
    final, traj, final_e = batched_train(loss, batch, optax.adam(0.2), 300)
    assert traj.shape == (300, 5)
    np.testing.assert_allclose(np.asarray(final["x"]),
                               np.tile(np.asarray(target), (5, 1)), atol=1e-2)
    assert (np.asarray(final_e) < 1e-3).all()


@pytest.mark.slow
def test_multistart_hea_h2():
    """Best-of-B HEA on H2 reaches FCI where the batch parity holds."""
    from qsfh_tpu.molecules import H2

    mol = H2(0.8)
    ms = MultistartHEA(mol, n_starts=6, n_epoch=150, reps=2, lr=0.1, seed=2)
    vals = jax.vmap(ms.loss)(ms.batch_params)
    for b in range(3):
        np.testing.assert_allclose(
            float(ms.loss(ms.batch_params[b])), float(vals[b]), rtol=1e-12
        )
    out = ms.run()
    assert out["fci_energy"] == pytest.approx(mol.fci_energy)
    assert out["best_gap"] < 5e-3
    # the spread across starts is real: the worst start is measurably above
    assert out["final_energies"].max() > out["best_energy"] + 1e-6


def test_validation_errors():
    with pytest.raises(ValueError):
        _make(0)
    with pytest.raises(ValueError):
        _make(6, mesh_devices=4)
