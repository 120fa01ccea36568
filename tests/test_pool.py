"""Operator-pool tests (reference: /root/reference/operators/pool.py)."""

import numpy as np
import pytest

from qsfh_tpu.ops.fermion import FermionOperator, hermitian_conjugated, normal_ordered
from qsfh_tpu.ops.jw import jordan_wigner
from qsfh_tpu.ops.pool import (
    excitations,
    general_operator_pool,
    hubbard_interaction_pool,
    hubbard_interaction_pool_extended,
    hubbard_interaction_pool_modified,
    hubbard_interaction_pool_same_spin,
    hubbard_interaction_pool_simplified,
    spin_complemented_pool,
)


def _is_hermitian(op):
    return normal_ordered(hermitian_conjugated(op)).isclose(op)


def _term_charge_spin(term):
    """(particle-number change, 2*Sz change) of one ladder monomial."""
    dn = 0
    dsz2 = 0
    for mode, action in term:
        s = 1 if action == 1 else -1
        dn += s
        dsz2 += s * (1 if mode % 2 == 0 else -1)
    return dn, dsz2


class TestSimplifiedPool:
    def test_2x2_size(self):
        # golden: 96 (spin,k1,k2,q!=0) candidates dedup to 24 on 2x2
        assert len(hubbard_interaction_pool_simplified(2, 2)) == 24

    def test_2x3_size(self):
        assert len(hubbard_interaction_pool_simplified(2, 3)) == 90

    def test_hermitian_and_symmetry(self):
        pool = hubbard_interaction_pool_simplified(2, 2)
        for op in pool:
            assert _is_hermitian(op)
            assert op.many_body_order() == 4
            for term in op.terms:
                dn, dsz2 = _term_charge_spin(term)
                assert dn == 0  # particle-number conserving
                assert dsz2 == 0  # Sz conserving

    def test_unique_up_to_sign(self):
        pool = hubbard_interaction_pool_simplified(2, 2)
        for i, a in enumerate(pool):
            for b in pool[i + 1 :]:
                assert not a.isclose(b)
                assert not a.isclose(-b)

    def test_jw_hermitian(self):
        for op in hubbard_interaction_pool_simplified(2, 2):
            assert jordan_wigner(op).is_hermitian()


class TestSameSpinPool:
    def test_sizes(self):
        # golden: dedup'd same-spin ZS scattering with Pauli-excluded
        # (c^2 = 0) index collisions dropped
        assert len(hubbard_interaction_pool_same_spin(2, 2)) == 6
        assert len(hubbard_interaction_pool_same_spin(2, 3)) == 24
        assert len(hubbard_interaction_pool_same_spin(3, 3)) == 108

    def test_hermitian_and_symmetry(self):
        pool = hubbard_interaction_pool_same_spin(2, 2)
        for op in pool:
            assert _is_hermitian(op)
            assert op.many_body_order() == 4
            for term in op.terms:
                dn, dsz2 = _term_charge_spin(term)
                assert dn == 0
                assert dsz2 == 0
            # every monomial lives in ONE spin sector (all modes same parity)
            for term in op.terms:
                parities = {mode % 2 for mode, _ in term}
                assert len(parities) == 1

    def test_extended_prefix_is_simplified(self):
        simp = hubbard_interaction_pool_simplified(2, 3)
        ext = hubbard_interaction_pool_extended(2, 3)
        assert len(ext) == len(simp) + len(hubbard_interaction_pool_same_spin(2, 3))
        for a, b in zip(ext[: len(simp)], simp):
            assert a.isclose(b)

    def test_disjoint_from_simplified(self):
        # opposite-spin vs same-spin monomials cannot coincide
        simp = hubbard_interaction_pool_simplified(2, 2)
        for op in hubbard_interaction_pool_same_spin(2, 2):
            for b in simp:
                assert not op.isclose(b) and not op.isclose(-b)


class TestFullPool:
    def test_2x2_channels(self):
        ch = hubbard_interaction_pool(2, 2)
        assert len(ch["ZS channel"]) == 25  # deduped (incl. one zero-q identity class)
        assert len(ch["ZS2 channel"]) == 128  # un-deduped: 2*4*4*4
        assert len(ch["BCS channel"]) == 128

    def test_hermitian_variant(self):
        ch = hubbard_interaction_pool(2, 2, hermitian=True)
        assert len(ch["ZS channel"]) == 128
        for op in ch["ZS channel"][:8]:
            assert normal_ordered(hermitian_conjugated(op)).isclose(normal_ordered(op))


class TestExcitations:
    def test_counts_4e_4orb(self):
        singles, doubles = excitations(4, 4)
        assert len(singles) == 12
        assert len(doubles) == 32

    def test_sz_filter(self):
        singles, doubles = excitations(4, 4, delta_sz=0)
        sz = lambda i: 0.5 if i % 2 == 0 else -0.5
        for q, p in singles:
            assert sz(p) - sz(q) == 0
        for s, r, q, p in doubles:
            assert sz(p) + sz(q) - sz(r) - sz(s) == 0

    def test_non_generalized(self):
        singles, doubles = excitations(2, 2, generalized=False)
        for q, p in singles:
            assert q < 2 <= p


class TestSpinComplementedPool:
    def test_antihermitian(self):
        pool = spin_complemented_pool(4, 4)
        assert len(pool) == 22
        for op in pool:
            assert normal_ordered(hermitian_conjugated(op)).isclose(-op)


class TestModifiedPool:
    def test_channels_build(self):
        ch = hubbard_interaction_pool_modified(2, 2)
        assert set(ch) == {
            "ZS channel",
            "ZS2 channel",
            "W channel",
            "BCS channel",
            "BCS2 channel",
        }
        for op in ch.values():
            assert len(op.terms) == 32


class TestGeneralPool:
    def test_1x2_contents(self):
        pool = general_operator_pool(1, 2)
        assert len(pool) == 43
        # every op is Hermitian (i(A - A^dag) form)
        for op in pool[:10]:
            assert _is_hermitian(op)
