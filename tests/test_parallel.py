"""Amplitude-sharded engine tests on the virtual 8-device CPU mesh.

SURVEY.md section 4: multi-device tests without a pod via
--xla_force_host_platform_device_count=8 (set in conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qsfh_tpu.algos.base import HubbardProblem
from qsfh_tpu.algos.hva import hva_circuit
from qsfh_tpu.engine.circuits import slater_prep_reim
from qsfh_tpu.engine.state import from_reim
from qsfh_tpu.parallel import (
    amplitude_mesh,
    build_sharded_hva_step,
    local_qubits,
    shard_statevector,
)


@pytest.fixture(scope="module")
def problem():
    return HubbardProblem(2, 3, 1.0, 6.0, 6, 3, 3)


class TestMesh:
    def test_mesh_and_local_qubits(self):
        assert jax.device_count() == 8
        mesh = amplitude_mesh(8)
        assert mesh.devices.size == 8
        assert local_qubits(12, mesh) == 9  # top 3 bits sharded

    def test_power_of_two_required(self):
        with pytest.raises(ValueError):
            amplitude_mesh(6)

    def test_shard_statevector_places_shards(self):
        mesh = amplitude_mesh(8)
        psi = jnp.arange(1 << 12).astype(jnp.complex128)
        sharded = shard_statevector(psi, mesh)
        assert len(sharded.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(psi))


class TestShardedHVA:
    @pytest.mark.slow
    def test_sharded_step_matches_single_device(self, problem):
        """The sharded train step must produce the same energy and gradient
        norm as the unsharded circuit at non-degenerate parameter points.

        (The zero init sits on the half-filling saddle where gradients are
        pure roundoff, so Adam trajectories diverge chaotically -- compare
        per-point step outputs instead.)
        """
        mesh = amplitude_mesh(8)
        reps = 2
        with mesh:
            step, params0, _ = build_sharded_hva_step(
                problem, reps=reps, mesh=mesh, dtype=jnp.complex128, lr=5e-2
            )
        nv = params0["theta_v"].shape[0] // reps
        nh = params0["theta_h"].shape[0] // reps

        def point(seed):
            return {
                "theta_U": 0.1
                * jax.random.normal(jax.random.PRNGKey(seed), (reps + 1,), dtype=jnp.float64),
                "theta_v": 0.1
                * jax.random.normal(
                    jax.random.PRNGKey(seed + 50), (reps * nv,), dtype=jnp.float64
                ),
                "theta_h": 0.1
                * jax.random.normal(
                    jax.random.PRNGKey(seed + 99), (reps * nh,), dtype=jnp.float64
                ),
            }

        energies_sharded, gnorms_sharded = [], []
        with mesh:
            for seed in (1, 2, 3):
                _, _, e, gn = step(point(seed), optax.adam(5e-2).init(point(seed)))
                energies_sharded.append(float(e))
                gnorms_sharded.append(float(gn))

        # single-device evaluation at the same points
        h_gen, v_gen = problem.hva_generators()
        h_rot = [g.rotation_terms() for g in h_gen]
        v_rot = [g.rotation_terms() for g in v_gen]
        cd = problem.coulomb_diagonal(dtype=jnp.float64)
        psi0_reim = slater_prep_reim(
            problem.n_qubits,
            problem.spin_up_indices + problem.spin_down_indices,
            problem.diagonal,
            problem.decomposition,
            dtype=jnp.complex128,
        )
        obs = problem.observables["H"]

        def loss(par):
            psi = hva_circuit(
                from_reim(psi0_reim, jnp.complex128),
                problem.n_qubits,
                cd,
                v_rot,
                h_rot,
                reps,
                par,
            )
            return obs.expectation(psi)

        grad_fn = jax.jit(jax.value_and_grad(loss))
        for k, seed in enumerate((1, 2, 3)):
            e, g = grad_fn(point(seed))
            np.testing.assert_allclose(energies_sharded[k], float(e), atol=1e-10)
            np.testing.assert_allclose(
                gnorms_sharded[k], float(optax.global_norm(g)), atol=1e-9
            )

    def test_expectation_sharded_matches(self, problem):
        """Matrix-free expectation over a sharded statevector equals the
        replicated result (flip lowers to collective permute)."""
        mesh = amplitude_mesh(8)
        n = problem.n_qubits
        key = jax.random.PRNGKey(0)
        psi = jax.random.normal(key, (1 << n,), dtype=jnp.float64) + 1j * jax.random.normal(
            jax.random.PRNGKey(1), (1 << n,), dtype=jnp.float64
        )
        psi = psi / jnp.linalg.norm(psi)
        expected = float(problem.observables["H"].expectation(psi))
        psi_sharded = shard_statevector(psi.astype(jnp.complex128), mesh)
        with mesh:
            got = float(jax.jit(problem.observables["H"].expectation)(psi_sharded))
        np.testing.assert_allclose(got, expected, atol=1e-10)


class TestShardedPoolScreening:
    def test_matches_screen_scan(self, problem):
        """Pool-parallel screening (terms sharded over the mesh) equals the
        single-device batched screening."""
        import jax.numpy as jnp
        from qsfh_tpu.engine.expectation import PackedPool
        from qsfh_tpu.ops.jw import jordan_wigner
        from qsfh_tpu.ops.pool import hubbard_interaction_pool_simplified
        from qsfh_tpu.parallel.pool_screening import build_sharded_pool_screen

        n = problem.n_qubits
        pool_ops = [jordan_wigner(g) for g in hubbard_interaction_pool_simplified(2, 3)]
        pool = PackedPool(pool_ops, n)
        mesh = amplitude_mesh(8)
        key = jax.random.PRNGKey(3)
        psi = jax.random.normal(key, (1 << n,), dtype=jnp.float64) + 1j * jax.random.normal(
            jax.random.PRNGKey(4), (1 << n,), dtype=jnp.float64
        )
        psi = (psi / jnp.linalg.norm(psi)).astype(jnp.complex128)
        w = problem.observables["H"].apply(psi)

        expected = np.asarray(pool.screen_scan(psi, w))
        with mesh:
            got = np.asarray(build_sharded_pool_screen(pool, mesh)(psi, w))
        assert expected.shape == got.shape == (pool.size,)
        np.testing.assert_allclose(got, expected, atol=1e-10)


@pytest.mark.slow
class TestBeyondReferenceScale:
    def test_20_qubit_sharded_adapt_step(self):
        """A 2x5 (20-qubit) fully sharded ADAPT train step -- beyond the
        reference's 18-qubit ceiling (its backend switch at 20 qubits
        required a CUDA GPU, adapt_vqe.py:299-304)."""
        import jax.numpy as jnp
        from qsfh_tpu.algos.base import HubbardProblem
        from qsfh_tpu.ops.jw import jordan_wigner
        from qsfh_tpu.ops.pool import hubbard_interaction_pool_simplified
        from qsfh_tpu.parallel.sharded_adapt import build_sharded_adapt_step

        p = HubbardProblem(2, 5, 1.0, 6.0, 10, 5, 5)
        assert p.n_qubits == 20
        pool = hubbard_interaction_pool_simplified(2, 5)[:6]
        pool_rot = [jordan_wigner(g).rotation_terms() for g in pool]
        mesh = amplitude_mesh(8)
        with mesh:
            step, th0, st0 = build_sharded_adapt_step(
                p, pool_rot, [0, 1, 2, 3], mesh, dtype=jnp.complex64, lr=1e-2
            )
            th, st, e, gn = step(
                jnp.asarray([0.1, 0.05, -0.05, 0.02], jnp.float32), st0
            )
        assert np.isfinite(float(e)) and np.isfinite(float(gn))
        assert float(gn) > 0


class TestShardedAdjointGradient:
    @pytest.mark.slow
    def test_adjoint_matches_backprop_f64(self):
        """The sharded reverse-replay gradient (O(1) memory in depth, the
        32-qubit enabler) equals plain backprop through the shard_map
        region at f64 precision."""
        import jax.numpy as jnp
        import optax
        from qsfh_tpu.algos.base import HubbardProblem
        from qsfh_tpu.ops.jw import jordan_wigner
        from qsfh_tpu.ops.pool import hubbard_interaction_pool_simplified
        from qsfh_tpu.parallel.sharded_adapt import build_sharded_adapt_step

        p = HubbardProblem(2, 3, 1.0, 6.0, 6, 3, 3)
        pool_rot = [
            jordan_wigner(g).rotation_terms()
            for g in hubbard_interaction_pool_simplified(2, 3)[:4]
        ]
        mesh = amplitude_mesh(8)
        outs = {}
        for mode in ("adjoint", "backprop"):
            with mesh:
                step, th0, _ = build_sharded_adapt_step(
                    p, pool_rot, [0, 1, 2, 3], mesh,
                    dtype=jnp.complex128, lr=1e-2, gradient=mode,
                )
                th = th0 + 0.07
                st = optax.adam(1e-2).init(th)
                th2, st, e, gn = step(th, st)
                outs[mode] = (np.asarray(th2), float(e), float(gn))
        a, b = outs["adjoint"], outs["backprop"]
        assert a[1] == pytest.approx(b[1], abs=1e-12)
        assert a[2] == pytest.approx(b[2], abs=1e-9)
        np.testing.assert_allclose(a[0], b[0], atol=1e-8)

    def test_unknown_gradient_mode_raises(self):
        import jax.numpy as jnp
        from qsfh_tpu.algos.base import HubbardProblem
        from qsfh_tpu.parallel.sharded_adapt import build_sharded_adapt_step

        p = HubbardProblem(2, 2, 1.0, 6.0, 4, 2, 2)
        mesh = amplitude_mesh(8)
        with pytest.raises(ValueError):
            build_sharded_adapt_step(p, [], [], mesh, gradient="nope")


class TestScanLowering:
    @pytest.mark.slow
    def test_scan_matches_unrolled_bitwise_f64(self):
        """The constant-size scan lowering (per-generator static-flip scans +
        Givens u4 scans) is exactly the same computation as the unrolled
        sharded program -- identical energy/gradient bit patterns at f64."""
        import jax.numpy as jnp
        import optax
        from qsfh_tpu.algos.base import HubbardProblem
        from qsfh_tpu.ops.jw import jordan_wigner
        from qsfh_tpu.ops.pool import hubbard_interaction_pool_simplified
        from qsfh_tpu.parallel.sharded_adapt import build_sharded_adapt_step

        p = HubbardProblem(2, 3, 1.0, 6.0, 6, 3, 3)
        pool_rot = [
            jordan_wigner(g).rotation_terms()
            for g in hubbard_interaction_pool_simplified(2, 3)[:4]
        ]
        mesh = amplitude_mesh(8)
        outs = {}
        for lowering in ("scan", "unrolled"):
            with mesh:
                step, th0, _ = build_sharded_adapt_step(
                    p, pool_rot, [0, 1, 2, 3], mesh,
                    dtype=jnp.complex128, lr=1e-2, lowering=lowering,
                )
                th = th0 + 0.07
                st = optax.adam(1e-2).init(th)
                th2, st, e, gn = step(th, st)
                outs[lowering] = (np.asarray(th2), float(e), float(gn))
        a, b = outs["scan"], outs["unrolled"]
        assert a[1] == b[1]
        assert a[2] == b[2]
        assert np.array_equal(a[0], b[0])

    def test_unknown_lowering_raises(self):
        from qsfh_tpu.algos.base import HubbardProblem
        from qsfh_tpu.parallel.sharded_adapt import build_sharded_adapt_step

        p = HubbardProblem(2, 2, 1.0, 6.0, 4, 2, 2)
        with pytest.raises(ValueError):
            build_sharded_adapt_step(p, [], [], amplitude_mesh(8), lowering="nope")


class TestShmapHVA:
    @pytest.mark.slow
    def test_matches_gspmd_step_f64(self):
        """The explicit shard_map HVA step (scan-lowered, adjoint gradient,
        no 2^n host Coulomb vector -- the 32-qubit form) matches the GSPMD
        step at f64."""
        import jax
        import jax.numpy as jnp
        import optax
        from qsfh_tpu.algos.base import HubbardProblem
        from qsfh_tpu.parallel import (
            build_sharded_hva_step,
            build_sharded_hva_step_shmap,
        )

        p = HubbardProblem(2, 3, 1.0, 6.0, 6, 3, 3)
        mesh = amplitude_mesh(8)
        with mesh:
            g_step, g_params, _ = build_sharded_hva_step(
                p, 2, mesh, dtype=jnp.complex128, lr=1e-2
            )
            g_params = jax.tree.map(lambda a: a + 0.07, g_params)
            g_opt = optax.adam(1e-2).init(g_params)
            gp, _, ge, ggn = g_step(g_params, g_opt)
        with mesh:
            s_step, s_params, _ = build_sharded_hva_step_shmap(
                p, 2, mesh, dtype=jnp.complex128, lr=1e-2
            )
            s_params = s_params + 0.07
            s_opt = optax.adam(1e-2).init(s_params)
            sp, _, se, sgn = s_step(s_params, s_opt)
        assert float(ge) == pytest.approx(float(se), abs=1e-12)
        assert float(ggn) == pytest.approx(float(sgn), abs=1e-10)
        flat_g = np.concatenate(
            [np.asarray(gp["theta_U"]), np.asarray(gp["theta_v"]), np.asarray(gp["theta_h"])]
        )
        np.testing.assert_allclose(flat_g, np.asarray(sp), atol=1e-12)


class TestMeshDriverHVA:
    @pytest.mark.slow
    def test_driver_mesh_step_matches_single_chip(self, tmp_path, monkeypatch):
        """HVA(mesh_devices=8) trains on the sharded step with the same
        7-tuple metric surface; one step from a nudged (non-saddle) point
        matches the single-chip step at f64."""
        import jax
        import jax.numpy as jnp
        import optax
        from qsfh_tpu.algos.hva import HVA

        monkeypatch.chdir(tmp_path)
        outs = {}
        for md in (1, 8):
            vqe = HVA(
                n_epoch=0, reps=2, lr=1e-2, x_dimension=2, y_dimension=2,
                n_electrons=4, n_spin_up=2, n_spin_down=2, tunneling=1,
                coulomb=6, plot=False, log_metrics=False, mesh_devices=md,
            )
            params = jax.tree.map(lambda a: a + 0.07, vqe.params)
            opt_state = vqe.optimizer.init(params)
            p2, _, e, sz, s2, fid, gn = vqe._step(params, opt_state)
            outs[md] = (
                np.concatenate([np.asarray(p2[k]) for k in ("theta_U", "theta_v", "theta_h")]),
                float(e), float(sz), float(s2), float(fid), float(gn),
            )
        a, b = outs[1], outs[8]
        for i, (x, y) in enumerate(zip(a[1:], b[1:])):
            assert x == pytest.approx(y, abs=1e-9), f"metric {i}"
        np.testing.assert_allclose(a[0], b[0], atol=1e-9)


class TestMeshDriverADAPT:
    @pytest.mark.slow
    def test_driver_mesh_run_matches_single_chip(self, tmp_path, monkeypatch):
        """ADAPT(mesh_devices=8): screening, selection, and training all run
        sharded and reproduce the single-chip run to f64 precision
        (selection order made deterministic under exact pool-gradient
        degeneracies by the stable tie-break)."""
        from qsfh_tpu.algos.adapt import ADAPT

        monkeypatch.chdir(tmp_path)
        runs = {}
        for md in (1, 8):
            vqe = ADAPT(
                n_epoch=1, threshold1=1e-2, threshold2=1e-1,
                x_dimension=2, y_dimension=2, n_electrons=4, n_spin_up=2,
                n_spin_down=2, tunneling=1.0, coulomb=6.0,
                max_inner_iterations=10, plot=False, log_metrics=False,
                mesh_devices=md,
            )
            vqe.run()
            runs[md] = vqe.results
        assert runs[1]["selected operators"] == runs[8]["selected operators"]
        a = np.array(runs[1]["epoch loss"], dtype=float)
        b = np.array(runs[8]["epoch loss"], dtype=float)
        np.testing.assert_allclose(a, b, atol=1e-12)


class TestShardedStream:
    def test_streaming_expectation_matches_unsharded(self):
        """The HBM-streaming kernel family under shard_map (interpret mode
        on the CPU mesh): Re<psi|H|psi> of a 14-qubit state sharded over 8
        devices must match the unsharded f64 Observable evaluation of the
        same f32-quantized state (VERDICT r3 next #6)."""
        from qsfh_tpu.engine.expectation import Observable
        from qsfh_tpu.ops.jw import jordan_wigner
        from qsfh_tpu.ops.lattice import fermi_hubbard
        from qsfh_tpu.parallel.shmap_engine import ShardedPauliEngine
        from qsfh_tpu.parallel.sharded_stream import (
            pack_stream_groups,
            sharded_expectation_stream,
        )

        n = 14  # 1x7 lattice -> n_local = 11, the streaming minimum
        H = jordan_wigner(fermi_hubbard(7, 1, 1.0, 4.0, periodic=True))
        rng = np.random.default_rng(23)
        psi = rng.standard_normal(1 << n) + 1j * rng.standard_normal(1 << n)
        psi /= np.linalg.norm(psi)
        re32 = psi.real.astype(np.float32)
        im32 = psi.imag.astype(np.float32)
        psi32 = re32.astype(np.float64) + 1j * im32.astype(np.float64)

        ref = float(Observable(H, n).expectation(jnp.asarray(psi32)))

        mesh = amplitude_mesh(8)
        engine = ShardedPauliEngine(n, mesh)
        # the packing must split terms across BOTH mask classes or the
        # cross-shard machinery is untested
        packed = pack_stream_groups(H, engine.n, engine.k)
        assert any(xh != 0 for (xh, _zh) in packed)
        assert any(zh != 0 for (_xh, zh) in packed)

        with mesh:
            fn = sharded_expectation_stream(engine, H)
            got = float(
                fn(shard_statevector(jnp.asarray(psi32, jnp.complex64), mesh))
            )
        assert got == pytest.approx(ref, abs=5e-5)
