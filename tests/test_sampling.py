"""Shot-based measurement: QWC grouping, sampling, grouped estimation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qsfh_tpu.engine.expectation import Observable
from qsfh_tpu.engine.sampling import (
    estimate_expectation,
    estimate_expectation_scan,
    qwc_groups,
    sample_bitstrings,
    sample_counts,
    string_support,
)
from qsfh_tpu.engine.state import basis_state
import scipy.sparse.linalg as spla

from qsfh_tpu.linalg.exact import get_sparse_operator
from qsfh_tpu.ops.jw import jordan_wigner
from qsfh_tpu.ops.lattice import fermi_hubbard
from qsfh_tpu.ops.pauli import PauliSum, qubit_operator


def _pairwise_qwc(op, i, j):
    xm, ym, zm = string_support(op)
    for a, b in ((xm, ym), (xm, zm), (ym, zm)):
        if (a[i] & b[j]) or (b[i] & a[j]):
            return False
    return True


# ---- grouping ----------------------------------------------------------------


def test_qwc_groups_are_valid_and_cover():
    ham = jordan_wigner(fermi_hubbard(2, 2, 1.0, 4.0))
    groups = qwc_groups(ham)
    seen = np.concatenate(groups)
    assert sorted(seen.tolist()) == list(range(len(ham)))
    for g in groups:
        for a in range(len(g)):
            for b in range(a + 1, len(g)):
                assert _pairwise_qwc(ham, int(g[a]), int(g[b]))
    # grouping must beat one-term-per-group by a wide margin
    assert len(groups) < len(ham) / 2


def test_qwc_groups_singletons_for_anticommuting():
    op = qubit_operator("X0") + qubit_operator("Y0") + qubit_operator("Z0")
    groups = qwc_groups(op)
    assert len(groups) == 3


# ---- sampling ----------------------------------------------------------------


def test_sample_bitstrings_deterministic_on_basis_state():
    psi = basis_state(4, [0, 2])
    s = np.asarray(sample_bitstrings(psi, 4, 64, jax.random.PRNGKey(0)))
    # qubit 0 is the most significant flat bit (state.py:17)
    assert (s == 0b1010).all()


def test_sample_counts_match_born_rule():
    # |psi> = sqrt(0.8)|00> + sqrt(0.2)|11>
    psi = jnp.zeros(4, dtype=jnp.complex128)
    psi = psi.at[0].set(np.sqrt(0.8)).at[3].set(np.sqrt(0.2))
    counts = sample_counts(psi, 2, 4000, jax.random.PRNGKey(1))
    assert set(counts) <= {"00", "11"}
    assert abs(counts["00"] / 4000 - 0.8) < 0.03


# ---- estimation ---------------------------------------------------------------


def test_estimate_exact_on_stabilizer_eigenstate():
    # |++> is a +1 eigenstate of X0, X1, X0X1: zero-variance estimates
    psi = jnp.full(4, 0.5, dtype=jnp.complex128)
    op = (
        qubit_operator("X0", 0.5)
        + qubit_operator("X1", 0.25)
        + qubit_operator("X0 X1", -2.0)
        + PauliSum.identity(3.0)
    )
    res = estimate_expectation(psi, 2, op, shots=32, key=jax.random.PRNGKey(2))
    assert res.mean == pytest.approx(0.5 + 0.25 - 2.0 + 3.0, abs=1e-12)
    assert res.stderr == pytest.approx(0.0, abs=1e-12)


def test_estimate_single_qubit_y():
    # |psi> = (|0> + i|1>)/sqrt(2) has <Y> = +1 (exact under rotation H S^dag)
    psi = jnp.array([1.0, 1.0j], dtype=jnp.complex128) / np.sqrt(2.0)
    res = estimate_expectation(
        psi, 1, qubit_operator("Y0"), shots=16, key=jax.random.PRNGKey(3)
    )
    assert res.mean == pytest.approx(1.0, abs=1e-12)


@pytest.mark.slow  # ~13 s statistical run; scan-vs-host estimator parity stays fast
def test_estimate_hubbard_energy_within_error_bars():
    ham = jordan_wigner(fermi_hubbard(2, 2, 1.0, 4.0))
    n = 8
    h = get_sparse_operator(ham, n)
    _, vecs = spla.eigsh(h, k=1, which="SA")
    psi = jnp.asarray(vecs[:, 0].astype(np.complex128))
    exact = float(np.real(Observable(ham, n).expectation(psi)))
    res = estimate_expectation(psi, n, ham, shots=6000, key=jax.random.PRNGKey(4))
    assert res.stderr > 0
    assert abs(res.mean - exact) < 5 * res.stderr
    assert abs(res.mean - exact) < 0.15  # absolute sanity on the scale


def test_scan_estimator_matches_host_loop():
    """Same key split, same per-group sample streams: the scan lowering
    reproduces the host-loop estimator (rotations differ only by the
    traced selection arithmetic)."""
    ham = jordan_wigner(fermi_hubbard(2, 2, 1.0, 4.0))
    n = 8
    h = get_sparse_operator(ham, n)
    _, vecs = spla.eigsh(h, k=1, which="SA")
    psi = jnp.asarray(vecs[:, 0].astype(np.complex128))
    key = jax.random.PRNGKey(9)
    a = estimate_expectation(psi, n, ham, shots=500, key=key)
    b = estimate_expectation_scan(psi, n, ham, shots=500, key=key)
    assert b.mean == pytest.approx(a.mean, abs=1e-9)
    assert b.stderr == pytest.approx(a.stderr, abs=1e-9)
    np.testing.assert_allclose(b.group_means, a.group_means, atol=1e-9)


def test_scan_estimator_exact_on_stabilizer():
    psi = jnp.full(4, 0.5, dtype=jnp.complex128)  # |++>
    op = (
        qubit_operator("X0", 0.5)
        + qubit_operator("X0 X1", -2.0)
        + PauliSum.identity(3.0)
    )
    res = estimate_expectation_scan(psi, 2, op, shots=16, key=jax.random.PRNGKey(10))
    assert res.mean == pytest.approx(0.5 - 2.0 + 3.0, abs=1e-12)
    assert res.stderr == pytest.approx(0.0, abs=1e-12)


def test_scan_estimator_identity_only():
    res = estimate_expectation_scan(
        jnp.array([1.0, 0.0], dtype=jnp.complex128),
        1,
        PauliSum.identity(2.5),
        shots=8,
        key=jax.random.PRNGKey(11),
    )
    assert res.mean == pytest.approx(2.5)
    assert res.stderr == 0.0


def test_estimate_rejects_non_hermitian():
    op = qubit_operator("X0", 1.0j)
    with pytest.raises(ValueError):
        estimate_expectation(
            jnp.array([1.0, 0.0], dtype=jnp.complex128),
            1,
            op,
            shots=8,
            key=jax.random.PRNGKey(5),
        )


def test_n_groups_matches_per_group_arrays():
    """n_groups counts MEASURED groups; identity-only content is folded
    into the exact constant, so the per-group arrays always line up."""
    res = estimate_expectation_scan(
        jnp.array([1.0, 0.0], dtype=jnp.complex128),
        1,
        PauliSum.identity(2.5),
        shots=8,
        key=jax.random.PRNGKey(11),
    )
    assert res.n_groups == 0 == len(res.group_means)
    op = qubit_operator("Z0", 0.5) + PauliSum.identity(1.0)
    res = estimate_expectation(
        jnp.array([1.0, 0.0], dtype=jnp.complex128),
        1,
        op,
        shots=16,
        key=jax.random.PRNGKey(12),
    )
    assert res.n_groups == len(res.group_means) == len(res.group_stderrs)
    assert res.mean == pytest.approx(1.5)
